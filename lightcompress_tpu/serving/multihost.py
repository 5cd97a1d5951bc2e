"""Multi-host serving: data-parallel engine replicas over a (dp, tp) mesh.

The reference delegates serving entirely to vLLM/SGLang (SURVEY §2.11 — no
TP/PP in-repo); our TPU-native engine scales in two composable ways:

- **tp** (intra-replica): Megatron NamedShardings + GSPMD collectives over
  ICI (serving/sharding.py) — one model instance spanning a tp group.
- **dp** (inter-replica): independent continuous-batching engines, one per
  tp group, with host-side request routing.  No cross-replica collectives
  — the scaling-book recipe for serving: replicate until HBM runs out,
  shard (tp) only to fit the model.

Under ``jax.distributed`` each host builds the same global (dp, tp) mesh;
tp groups are laid out within a host's ICI domain and dp spans hosts (DCN).
A host instantiates only the replicas whose devices are local
(``local_replicas_only=True``) — routing between hosts is the caller's
front-end concern (requests are independent).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .engine import LLMEngine
from .quantized_model import ServingWeights
from .sampler import SamplingParams


def tp_submeshes(mesh: Mesh) -> List[Mesh]:
    """Split a (dp, tp) mesh into per-replica (tp,) submeshes."""
    assert mesh.axis_names[:1] == ("dp",) and "tp" in mesh.axis_names, (
        f"need a (dp, tp) mesh, got axes {mesh.axis_names}")
    devs = mesh.devices  # (dp, tp)
    return [Mesh(devs[i], ("tp",)) for i in range(devs.shape[0])]


class ReplicatedEngine:
    """dp-replicated continuous-batching engines over a (dp, tp) mesh."""

    def __init__(
        self,
        weights: ServingWeights,
        mesh: Mesh,
        local_replicas_only: bool = True,
        **engine_kwargs,
    ):
        subs = tp_submeshes(mesh)
        if local_replicas_only:
            local = set(d.id for d in jax.local_devices())
            subs = [m for m in subs
                    if all(d.id in local for d in m.devices.flat)]
        assert subs, "no local tp groups in this mesh"
        # each engine device_puts the weights onto its own tp group; the
        # source pytree lives on host/first device and is copied per group.
        self.engines = [
            LLMEngine(weights, mesh=m, **engine_kwargs) for m in subs
        ]

    @property
    def n_replicas(self) -> int:
        return len(self.engines)

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        sampling: SamplingParams = SamplingParams(),
        eos_token_id: Optional[int] = None,
    ) -> List[List[int]]:
        """Route prompts round-robin over replicas; run replicas
        concurrently (each thread drives its own device group)."""
        n = len(self.engines)
        shards: List[List[int]] = [[] for _ in range(n)]  # request ids
        for i in range(len(prompts)):
            shards[i % n].append(i)

        def run(ei: int) -> List[List[int]]:
            idxs = shards[ei]
            if not idxs:
                return []
            return self.engines[ei].generate(
                [np.asarray(prompts[i], np.int32) for i in idxs],
                sampling=sampling, eos_token_id=eos_token_id,
            )

        with ThreadPoolExecutor(max_workers=n) as ex:
            per_rep = list(ex.map(run, range(n)))
        out: List[Optional[List[int]]] = [None] * len(prompts)
        for ei, idxs in enumerate(shards):
            for j, i in enumerate(idxs):
                out[i] = per_rep[ei][j]
        return out  # type: ignore[return-value]
