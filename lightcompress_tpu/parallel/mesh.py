"""Device-mesh sharding for calibration and serving.

The reference has only torchrun data-parallel calibration (SURVEY §2.11);
real TP lives in its external serving engines.  Here parallelism is
first-class: a ``jax.sharding.Mesh`` with axes ``(dp, tp)`` (expert axis for
MoE comes with the MoE family), Megatron-style column/row-parallel layout for
the transformer linears, and XLA-inserted collectives:

- attn.q/k/v, mlp.gate/up: column-parallel — weight rows (out features)
  sharded over ``tp``; activations stay sharded per-head until...
- attn.o, mlp.down: row-parallel — weight columns (in features) sharded over
  ``tp``; XLA emits the reduce-scatter/all-reduce after the matmul.
- embed / lm_head: vocab-sharded over ``tp``.
- batch dim of inputs sharded over ``dp`` (calibration DP,
  base_dataset.py:170-172 analogue).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    ep: int = 1,
) -> Mesh:
    """(dp, tp[, ep]) mesh.  ep > 1 adds an expert-parallel axis for MoE
    (experts sharded over hosts, SURVEY §2.11 TPU-native equivalents)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = (n // ep) if dp is None else n // (dp * ep)
    if dp is None:
        dp = n // (tp * ep)
    assert dp * tp * ep == n, f"dp({dp})*tp({tp})*ep({ep}) != {n}"
    if ep > 1:
        arr = np.array(devs).reshape(dp, tp, ep)
        return Mesh(arr, axis_names=("dp", "tp", "ep"))
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _block_pspecs(family: str) -> Dict[str, P]:
    """Canonical-path -> PartitionSpec for one block's weights."""
    common = {
        "ln1.weight": P(), "ln1.bias": P(),
        "ln2.weight": P(), "ln2.bias": P(),
        "attn.q.weight": P("tp", None), "attn.q.bias": P("tp"),
        "attn.k.weight": P("tp", None), "attn.k.bias": P("tp"),
        "attn.v.weight": P("tp", None), "attn.v.bias": P("tp"),
        "attn.o.weight": P(None, "tp"), "attn.o.bias": P(),
        "attn.q_norm.weight": P(), "attn.k_norm.weight": P(),
    }
    if family == "llama":
        common.update({
            "mlp.gate.weight": P("tp", None), "mlp.gate.bias": P("tp"),
            "mlp.up.weight": P("tp", None), "mlp.up.bias": P("tp"),
            "mlp.down.weight": P(None, "tp"), "mlp.down.bias": P(),
            # MoE: stacked 3D expert weights are detected by ndim in
            # _fit_spec and sharded over 'ep' (or 'tp' on 2-axis meshes);
            # router replicated
            "mlp.router.weight": P(),
            "mlp.shared_gate.weight": P("tp", None),
            "mlp.shared_up.weight": P("tp", None),
            "mlp.shared_down.weight": P(None, "tp"),
        })
    else:
        common.update({
            "mlp.fc1.weight": P("tp", None), "mlp.fc1.bias": P("tp"),
            "mlp.fc2.weight": P(None, "tp"), "mlp.fc2.bias": P(),
        })
    return common


def param_pspecs(arch) -> Dict:
    """PartitionSpec pytree matching init_params' structure."""
    top = {
        "embed": {"weight": P("tp", None)},
        "norm": {"weight": P(), "bias": P()},
    }
    if arch.family == "opt":
        top["embed_pos"] = {"weight": P()}
    if not arch.tie_word_embeddings:
        top["lm_head"] = {"weight": P("tp", None)}
    bp_flat = _block_pspecs(arch.family)
    bp: Dict = {}
    for k, spec in bp_flat.items():
        parts = k.split(".")
        node = bp
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = spec
    top["blocks"] = bp  # same spec tree for every block
    return top


def shard_params(params: Dict, mesh: Mesh, arch) -> Dict:
    """device_put the params tree with the TP layout."""
    specs = param_pspecs(arch)

    def place(tree, spec_tree):
        out = {}
        for k, v in tree.items():
            if k == "blocks":
                out[k] = [place(bp, spec_tree["blocks"]) for bp in v]
            elif isinstance(v, dict):
                out[k] = place(v, spec_tree.get(k, {}))
            else:
                spec = spec_tree.get(k, P()) if isinstance(spec_tree, dict) else P()
                if not isinstance(spec, P):
                    spec = P()
                spec = _fit_spec(v, spec, mesh)
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    return place(params, specs)


def _fit_spec(arr, spec: P, mesh: Mesh) -> P:
    """Drop sharding on axes not divisible by the mesh axis size; route
    stacked 3D expert weights onto the 'ep' axis when present."""
    if arr.ndim == 3 and len(spec) <= 2:
        ep_axis = "ep" if "ep" in mesh.axis_names else (
            spec[0] if len(spec) and isinstance(spec[0], str) else None
        )
        spec = P(ep_axis, None, None)
    new = []
    for dim, s in enumerate(spec):
        if s is None:
            new.append(None)
            continue
        size = mesh.shape[s] if isinstance(s, str) else 1
        if dim < arr.ndim and arr.shape[dim] % size == 0:
            new.append(s)
        else:
            new.append(None)
    return P(*new)


def shard_batch(x, mesh: Mesh):
    spec = P("dp") if x.shape[0] % mesh.shape["dp"] == 0 else P()
    return jax.device_put(x, NamedSharding(mesh, spec))
