"""Pipeline-parallel serving decode: stage-sharded quantized weights + KV.

The reference has no serving engine, let alone PP (SURVEY §2.11); this is
the TPU-native capability for serving models DEEPER than one chip's HBM:
layers split into ``pp`` contiguous stages, each device holding exactly
its stage's quantized block entries and its stage's slice of the KV
cache (both 1/pp of the memory).  One decode step runs as a shard_map
ring: every tick each device applies its stage to its current hidden
buffer and ``ppermute``s it to the next device; after ``pp`` ticks the
finished hidden lands back on stage 0.

This is the memory-scaling form (single in-flight token group — the ring
is busy 1/pp of the time per stage); slot-microbatched pipelining over
the same ring is the throughput extension and shares all of this layout.
Cache writes are tick-gated (a stage only commits KV on its own tick).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import arch as A
from .engine import _block_apply
from .quantized_model import ServingWeights

Array = jax.Array


def stack_block_entries(blocks: List[dict], pp: int) -> Any:
    """[L block entries] -> same pytree with leaves (pp, L/pp, ...).

    QLinearParams static fields (bits/layout/...) survive tree.map; all
    blocks must be structurally identical (uniform dense stacks)."""
    L = len(blocks)
    assert L % pp == 0, f"layers {L} not divisible by pp {pp}"
    per = L // pp

    def stack(*leaves):
        x = jnp.stack(leaves)
        return x.reshape(pp, per, *x.shape[1:])

    return jax.tree.map(stack, *blocks)


class PPDecoder:
    """Stage-sharded decode step over a ``pp`` mesh axis."""

    def __init__(self, sw: ServingWeights, mesh: Mesh, max_slots: int = 4,
                 max_len: int = 256):
        assert sw.arch.mla is None and sw.arch.moe is None, \
            "PP decode: uniform dense stacks"
        assert sw.arch.rope_enabled, "PP decode: rope families first"
        self.arch = sw.arch
        self.mesh = mesh
        self.pp = mesh.shape["pp"]
        self.per = sw.arch.num_layers // self.pp
        self.max_slots = max_slots
        self.max_len = max_len
        stacked = stack_block_entries(sw.blocks, self.pp)
        put = partial(self._shard0)
        self.stage_params = jax.tree.map(put, stacked)
        rep = NamedSharding(mesh, P())
        self.embed = jax.device_put(sw.embed, rep)
        head = sw.lm_head
        if sw.lm_head_scale is not None:  # dequant int8 serving heads
            head = (head.astype(jnp.float32)
                    * sw.lm_head_scale[:, None]).astype(jnp.bfloat16)
        self.lm_head = jax.device_put(head, rep)
        self.norm = jax.device_put(sw.norm, rep)
        a = sw.arch
        kv_shape = (self.pp, self.per, max_slots, a.num_kv_heads, max_len,
                    a.head_dim)
        self.k_cache = self._shard0(jnp.zeros(kv_shape, jnp.bfloat16))
        self.v_cache = self._shard0(jnp.zeros(kv_shape, jnp.bfloat16))
        self.lengths = jax.device_put(
            jnp.zeros((max_slots,), jnp.int32), rep)
        self._step = jax.jit(self._decode_step, donate_argnums=(1, 2))

    def _shard0(self, x):
        return jax.device_put(
            x, NamedSharding(self.mesh, P("pp", *([None] * (x.ndim - 1)))))

    # ------------------------------------------------------------------
    def prefill(self, slot: int, tokens):
        """Prefill one prompt through the PP ring: each stage processes
        the whole (1, T) prompt on its tick and commits its stage's KV
        for ``slot``.  Returns last-token logits (V,)."""
        ids = jnp.asarray([list(map(int, tokens))], jnp.int32)
        T = ids.shape[1]
        if not hasattr(self, "_prefill_jits"):
            self._prefill_jits = {}
        if T not in self._prefill_jits:
            self._prefill_jits[T] = jax.jit(
                self._prefill_ring, static_argnames=("T",),
                donate_argnums=(1, 2))
        (self.k_cache, self.v_cache, self.lengths,
         logits) = self._prefill_jits[T](
            self.stage_params, self.k_cache, self.v_cache, self.lengths,
            ids, jnp.asarray(slot), T=T)
        return logits

    def _prefill_ring(self, stage_params, k_cache, v_cache, lengths, ids,
                      slot, T: int):
        arch = self.arch
        x0 = self.embed[ids]  # (1, T, H)
        if arch.family == "llama":
            cos, sin = A.rope_cos_sin(arch, jnp.arange(T))
        else:
            cos = sin = None
        Tmax = self.max_len
        # cache empty for this slot: cache cols hidden, prompt causal
        mask = jnp.concatenate(
            [jnp.full((T, Tmax), jnp.finfo(jnp.float32).min),
             A.causal_mask(T, T)], axis=1)[None, None]

        class _SW:
            pass

        swf = _SW()
        swf.arch = arch
        swf.act_bits = 16

        def ring(stage_params, kc, vc, x0, mask, cos, sin, slot):
            sidx = jax.lax.axis_index("pp")

            def stage_apply(buf, kc, vc, commit):
                for i in range(self.per):
                    entry = jax.tree.map(lambda l: l[0, i], stage_params)
                    y, k_new, v_new = _block_apply(
                        swf, entry, buf,
                        cos, sin,
                        jax.lax.dynamic_index_in_dim(kc[0, i], slot, 0),
                        jax.lax.dynamic_index_in_dim(vc[0, i], slot, 0),
                        mask)
                    upd = jax.lax.dynamic_update_slice(
                        kc[0, i], k_new.astype(kc.dtype),
                        (slot, 0, 0, 0))
                    updv = jax.lax.dynamic_update_slice(
                        vc[0, i], v_new.astype(vc.dtype),
                        (slot, 0, 0, 0))
                    kc = kc.at[0, i].set(jnp.where(commit, upd, kc[0, i]))
                    vc = vc.at[0, i].set(jnp.where(commit, updv,
                                                   vc[0, i]))
                    buf = y
                return buf, kc, vc

            def tick(t, carry):
                buf, kc, vc = carry
                buf, kc, vc = stage_apply(buf, kc, vc, commit=(t == sidx))
                buf = jax.lax.ppermute(
                    buf, "pp",
                    [(i, (i + 1) % self.pp) for i in range(self.pp)])
                return buf, kc, vc

            buf, kc, vc = jax.lax.fori_loop(0, self.pp, tick, (x0, kc, vc))
            out = jax.lax.psum(
                jnp.where(sidx == 0, buf, jnp.zeros_like(buf)), "pp")
            return out, kc, vc

        spec_tree = jax.tree.map(lambda _: P("pp"), stage_params)
        rep = P()
        out, k_cache, v_cache = shard_map(
            ring, mesh=self.mesh,
            in_specs=(spec_tree, P("pp"), P("pp"), rep, rep, rep, rep,
                      rep),
            out_specs=(P(), P("pp"), P("pp")),
            check_vma=False,
        )(stage_params, k_cache, v_cache, x0, mask, cos, sin, slot)

        xl = A.rmsnorm(out, self.norm.get("weight"), arch.rms_eps) \
            if (arch.family == "llama" or arch.norm_type == "rmsnorm") \
            else A.layernorm(out, self.norm.get("weight"),
                             self.norm.get("bias"), 1e-5)
        logits = jnp.einsum("bth,vh->btv", xl.astype(jnp.bfloat16),
                            self.lm_head,
                            preferred_element_type=jnp.float32)
        lengths = lengths.at[slot].set(T)
        return k_cache, v_cache, lengths, logits[0, -1]

    # ------------------------------------------------------------------
    def _decode_step(self, stage_params, k_cache, v_cache, lengths,
                     cur_tokens, active_mask):
        arch = self.arch
        T = self.max_len
        x0 = self.embed[cur_tokens][:, None, :]  # (S, 1, H) replicated

        j = jnp.arange(T + 1)[None, None, None, :]
        visible = (j < lengths[:, None, None, None]) | (j == T)
        mask = jnp.where(visible, 0.0, jnp.finfo(jnp.float32).min)
        if arch.family == "llama":
            cos, sin = A.rope_cos_sin(arch, lengths[:, None])
        else:
            cos = sin = None

        class _SW:  # minimal sw facade for _block_apply
            pass

        swf = _SW()
        swf.arch = arch
        swf.act_bits = 16

        def ring(stage_params, kc, vc, x0, mask, cos, sin, lengths):
            # local shapes: stage_params leaves (1, per, ...);
            # kc/vc (1, per, S, H, T, D); the rest replicated
            sidx = jax.lax.axis_index("pp")

            def stage_apply(buf, kc, vc, commit):
                for i in range(self.per):
                    entry = jax.tree.map(lambda l: l[0, i], stage_params)
                    y, k_new, v_new = _block_apply(
                        swf, entry, buf, cos, sin,
                        kc[0, i], vc[0, i], mask)
                    upd = jax.vmap(
                        lambda b, n, p: jax.lax.dynamic_update_slice(
                            b, n.astype(b.dtype), (0, p, 0)))(
                        kc[0, i], k_new, lengths)
                    updv = jax.vmap(
                        lambda b, n, p: jax.lax.dynamic_update_slice(
                            b, n.astype(b.dtype), (0, p, 0)))(
                        vc[0, i], v_new, lengths)
                    kc = kc.at[0, i].set(jnp.where(commit, upd, kc[0, i]))
                    vc = vc.at[0, i].set(jnp.where(commit, updv, vc[0, i]))
                    buf = y
                return buf, kc, vc

            def tick(t, carry):
                buf, kc, vc = carry
                buf, kc, vc = stage_apply(buf, kc, vc, commit=(t == sidx))
                buf = jax.lax.ppermute(
                    buf, "pp",
                    [(i, (i + 1) % self.pp) for i in range(self.pp)])
                return buf, kc, vc

            buf, kc, vc = jax.lax.fori_loop(0, self.pp, tick, (x0, kc, vc))
            # the finished hidden sits on stage 0 after the last permute;
            # psum-broadcast it so the output is replicated
            out = jax.lax.psum(
                jnp.where(sidx == 0, buf, jnp.zeros_like(buf)), "pp")
            return out, kc, vc

        spec_tree = jax.tree.map(lambda _: P("pp"), stage_params)
        rep = P()
        out, k_cache, v_cache = shard_map(
            ring, mesh=self.mesh,
            in_specs=(spec_tree, P("pp"), P("pp"), rep, rep, rep, rep,
                      rep),
            out_specs=(P(), P("pp"), P("pp")),
            check_vma=False,
        )(stage_params, k_cache, v_cache, x0, mask, cos, sin, lengths)

        xl = A.rmsnorm(out, self.norm.get("weight"), arch.rms_eps) \
            if (arch.family == "llama" or arch.norm_type == "rmsnorm") \
            else A.layernorm(out, self.norm.get("weight"),
                             self.norm.get("bias"), 1e-5)
        logits = jnp.einsum("bth,vh->btv", xl.astype(jnp.bfloat16),
                            self.lm_head,
                            preferred_element_type=jnp.float32)[:, 0]
        lengths = jnp.where(active_mask, lengths + 1, lengths)
        return k_cache, v_cache, lengths, logits

    # ------------------------------------------------------------------
    def decode(self, cur_tokens: Array, active_mask: Array):
        """One PP decode step for every slot; returns logits (S, V)."""
        (self.k_cache, self.v_cache, self.lengths,
         logits) = self._step(self.stage_params, self.k_cache,
                              self.v_cache, self.lengths, cur_tokens,
                              active_mask)
        return logits

    # ------------------------------------------------------------------
    def _decode_step_mb(self, stage_params, k_cache, v_cache, lengths,
                        cur_tokens, active_mask):
        """Microbatched (pipelined) PP decode: slots split into ``pp``
        groups; tick t has stage s working on microbatch t-s, so all
        stages are busy through the steady state (GPipe bubble
        (pp-1)/(2pp-1) per step instead of the ring's (pp-1)/pp).  Cache
        commits are restricted to the active microbatch's slot rows."""
        arch = self.arch
        T = self.max_len
        M = self.pp
        S = self.max_slots
        g_sz = S // M
        x0 = self.embed[cur_tokens][:, None, :].reshape(M, g_sz, 1, -1)

        j = jnp.arange(T + 1)[None, None, None, :]
        visible = (j < lengths[:, None, None, None]) | (j == T)
        mask_all = jnp.where(visible, 0.0, jnp.finfo(jnp.float32).min)
        mask_all = mask_all.reshape(M, g_sz, 1, 1, T + 1)
        if arch.family == "llama":
            cos_a, sin_a = A.rope_cos_sin(arch, lengths[:, None])
            cos_a = cos_a.reshape(M, g_sz, 1, -1)
            sin_a = sin_a.reshape(M, g_sz, 1, -1)
        else:
            cos_a = sin_a = None
        len_mb = lengths.reshape(M, g_sz)

        class _SW:
            pass

        swf = _SW()
        swf.arch = arch
        swf.act_bits = 16

        def ring(stage_params, kc, vc, x0, mask_all, cos_a, sin_a,
                 len_mb):
            sidx = jax.lax.axis_index("pp")
            H = x0.shape[-1]

            def stage_apply(buf, kc, vc, mb):
                # slice this microbatch's cache rows (slots mb*g .. )
                start = mb * g_sz
                kcs = jax.lax.dynamic_slice(
                    kc, (0, 0, start) + (0,) * (kc.ndim - 3),
                    (1, self.per, g_sz) + kc.shape[3:])
                vcs = jax.lax.dynamic_slice(
                    vc, (0, 0, start) + (0,) * (vc.ndim - 3),
                    (1, self.per, g_sz) + vc.shape[3:])
                cos = (jax.lax.dynamic_index_in_dim(cos_a, mb, 0, False)
                       if cos_a is not None else None)
                sin = (jax.lax.dynamic_index_in_dim(sin_a, mb, 0, False)
                       if sin_a is not None else None)
                mask = jax.lax.dynamic_index_in_dim(mask_all, mb, 0,
                                                    False)
                lens = jax.lax.dynamic_index_in_dim(len_mb, mb, 0, False)
                for i in range(self.per):
                    entry = jax.tree.map(lambda l: l[0, i], stage_params)
                    y, k_new, v_new = _block_apply(
                        swf, entry, buf, cos, sin,
                        kcs[0, i], vcs[0, i], mask)
                    upd = jax.vmap(
                        lambda b, n, p: jax.lax.dynamic_update_slice(
                            b, n.astype(b.dtype), (0, p, 0)))(
                        kcs[0, i], k_new, lens)
                    updv = jax.vmap(
                        lambda b, n, p: jax.lax.dynamic_update_slice(
                            b, n.astype(b.dtype), (0, p, 0)))(
                        vcs[0, i], v_new, lens)
                    kcs = kcs.at[0, i].set(upd)
                    vcs = vcs.at[0, i].set(updv)
                    buf = y
                kc = jax.lax.dynamic_update_slice(
                    kc, kcs, (0, 0, start) + (0,) * (kc.ndim - 3))
                vc = jax.lax.dynamic_update_slice(
                    vc, vcs, (0, 0, start) + (0,) * (vc.ndim - 3))
                return buf, kc, vc

            out0 = jnp.zeros((M, g_sz, 1, H), jnp.bfloat16)

            def tick(t, carry):
                buf, kc, vc, out = carry
                mb = t - sidx
                valid = (mb >= 0) & (mb < M)
                # stage 0 injects microbatch t from the input stream
                buf = jnp.where(sidx == 0,
                                jax.lax.dynamic_index_in_dim(
                                    x0, jnp.clip(t, 0, M - 1), 0, False),
                                buf)

                def do(args):
                    b, kc_, vc_ = args
                    return stage_apply(b, kc_, vc_, jnp.clip(mb, 0, M - 1))

                def skip(args):
                    return args

                buf, kc, vc = jax.lax.cond(valid, do, skip, (buf, kc, vc))
                # last stage deposits finished microbatches
                out = jnp.where(
                    (sidx == self.pp - 1) & valid,
                    jax.lax.dynamic_update_slice(
                        out, buf.astype(out.dtype)[None],
                        (jnp.clip(mb, 0, M - 1), 0, 0, 0)),
                    out)
                buf = jax.lax.ppermute(
                    buf, "pp",
                    [(i, (i + 1) % self.pp) for i in range(self.pp)])
                return buf, kc, vc, out

            buf0 = jnp.zeros((g_sz, 1, H), x0.dtype)
            _, kc, vc, out = jax.lax.fori_loop(
                0, M + self.pp - 1, tick, (buf0, kc, vc, out0))
            out = jax.lax.psum(
                jnp.where(sidx == self.pp - 1, out, jnp.zeros_like(out)),
                "pp")
            return out, kc, vc

        spec_tree = jax.tree.map(lambda _: P("pp"), stage_params)
        rep = P()
        out, k_cache, v_cache = shard_map(
            ring, mesh=self.mesh,
            in_specs=(spec_tree, P("pp"), P("pp"), rep, rep, rep, rep,
                      rep),
            out_specs=(P(), P("pp"), P("pp")),
            check_vma=False,
        )(stage_params, k_cache, v_cache, x0, mask_all, cos_a, sin_a,
          len_mb)

        out = out.reshape(self.max_slots, 1, -1)
        xl = A.rmsnorm(out, self.norm.get("weight"), arch.rms_eps) \
            if (arch.family == "llama" or arch.norm_type == "rmsnorm") \
            else A.layernorm(out, self.norm.get("weight"),
                             self.norm.get("bias"), 1e-5)
        logits = jnp.einsum("bth,vh->btv", xl.astype(jnp.bfloat16),
                            self.lm_head,
                            preferred_element_type=jnp.float32)[:, 0]
        lengths = jnp.where(active_mask, lengths + 1, lengths)
        return k_cache, v_cache, lengths, logits

    def decode_microbatched(self, cur_tokens: Array, active_mask: Array):
        """Pipelined PP decode step (slot microbatches keep every stage
        busy in steady state); returns logits (S, V)."""
        assert self.max_slots % self.pp == 0
        if not hasattr(self, "_step_mb"):
            self._step_mb = jax.jit(self._decode_step_mb,
                                    donate_argnums=(1, 2))
        (self.k_cache, self.v_cache, self.lengths,
         logits) = self._step_mb(self.stage_params, self.k_cache,
                                 self.v_cache, self.lengths, cur_tokens,
                                 active_mask)
        return logits
