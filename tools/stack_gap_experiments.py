"""Locate the qlinear-stack bandwidth gap (453 GB/s stack vs ~640 GB/s
microbench): time chains of ONE matrix size at a time (W4A8 planes path,
serving pre-tiled scales), with the same per-token act-quant glue as the
real stack.  Sizes = Llama-8B decode linears:

  q/o   (4096, 4096)   8MB codes,  grid 2
  kv    (1024, 4096)   2MB codes,  grid 1   (no intra-kernel pipelining)
  gate  (14336, 4096)  29MB codes, grid 7
  down  (4096, 14336)  29MB codes, grid 8

Also: 'noquant' variants with pre-quantized int8 acts fed straight through
(isolates the act-quant + plane-reorder glue), and an 'allsizes' chain =
one full layer's 7 linears (sanity vs bench_split's 453).

SIZES env filters, e.g. SIZES=q,kv,gate,down,gate_nq,allsizes.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_matmul import (
    pack_int4_planes, pick_n_tile, tile_packed, tile_scales,
    quantize_act_per_token, w4a8_matmul_planes,
)

HIDDEN, INTER = 4096, 14336
GROUP = 128
B = 32
ITERS = 100          # low iter count
ITERS_HI = 500       # high count: marginal = (t_hi - t_lo) / (HI - LO)



def fold(y, ic):
    """Fold (B, oc) f32 back to (B, ic) to chain mismatched widths."""
    B, oc = y.shape
    if oc >= ic:
        m = oc // ic
        return y[:, :m * ic].reshape(B, m, ic).mean(1)
    reps = -(-ic // oc)
    return jnp.tile(y, (1, reps))[:, :ic]


def mk(key, oc, ic):
    codes = jax.random.randint(key, (oc, ic), 0, 16, jnp.int32)
    nt = pick_n_tile(oc, ic // 8, GROUP)
    gpp = ic // 8 // GROUP
    wp = tile_packed(pack_int4_planes(codes), nt, GROUP)
    s = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
    z = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
    sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
    zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
    nbytes = wp.size * 4 + sr.size * 2 + zsr.size * 2
    return (wp, sr, zsr, nt), nbytes


def timeit(label, run, x0, nbytes_per_iter):
    """Marginal per-iteration time via iter-count differencing: the axon
    tunnel adds ~20-30ms FIXED latency per execute, which swamps a chain of
    one cheap kernel (tools/dma_experiments6.py protocol)."""
    try:
        out = run(x0, ITERS)
        float(jnp.sum(out.astype(jnp.float32)))       # compile lo
        out = run(x0, ITERS_HI)
        float(jnp.sum(out.astype(jnp.float32)))       # compile hi + drain
        t0 = time.perf_counter()
        out = run(out, ITERS)
        float(jnp.sum(out.astype(jnp.float32)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(out, ITERS_HI)
        float(jnp.sum(out.astype(jnp.float32)))
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / (ITERS_HI - ITERS)
        print(json.dumps({
            "size": label, "us": round(per * 1e6, 1),
            "GBps": round(nbytes_per_iter / per / 1e9, 1),
            "fixed_ms": round((t_lo - per * ITERS) * 1e3, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"size": label, "error": str(e)[:300]}), flush=True)


def main():
    sizes = os.environ.get(
        "SIZES", "q,kv,gate,down,q_nq,kv_nq,allsizes").split(",")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    shapes = {"q": (HIDDEN, HIDDEN), "kv": (1024, HIDDEN),
              "gate": (INTER, HIDDEN), "down": (HIDDEN, INTER)}
    weights, nbytes = {}, {}
    for i, (nm, (oc, ic)) in enumerate(shapes.items()):
        weights[nm], nbytes[nm] = mk(ks[i], oc, ic)

    def one(nm, h):
        wp, sr, zsr, nt = weights[nm]
        hq, hs = quantize_act_per_token(h)
        return w4a8_matmul_planes(hq, hs, wp, sr, zsr, group=GROUP,
                                  n_tile=nt)

    # --- per-size chains (output fed back; reshape keeps (B, ic) input)
    for nm in ("q", "kv", "gate", "down"):
        if nm not in sizes:
            continue
        oc, ic = shapes[nm]

        wp, sr, zsr, nt = weights[nm]

        # weights as jit ARGS: closure constants are re-shipped per call
        # through the axon tunnel and poison the timing (r1 commit c906997)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(wp, sr, zsr, x0, iters, nm=nm, ic=ic, nt=nt):
            def body(i, h):
                hq, hs = quantize_act_per_token(h)
                y = w4a8_matmul_planes(hq, hs, wp, sr, zsr, group=GROUP,
                                       n_tile=nt)
                rep = fold(y.astype(jnp.float32), ic)
                return (rep * jax.lax.rsqrt(
                    jnp.mean(rep * rep, -1, keepdims=True) + 1e-6)
                ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, x0)

        x0 = jax.random.normal(key, (B, ic), jnp.bfloat16)
        timeit(nm, lambda a, it, wp=wp, sr=sr, zsr=zsr:
               run(wp, sr, zsr, a, iters=it), x0, nbytes[nm])

    # --- no-quant variants: pre-quantized int8 acts, no glue in the chain
    for nm in ("q_nq", "kv_nq", "gate_nq", "down_nq"):
        if nm not in sizes:
            continue
        base = nm[:-3]
        oc, ic = shapes[base]
        wp, sr, zsr, nt = weights[base]
        xq0 = jnp.ones((B, ic), jnp.int8)
        xs0 = jnp.full((B, 1), 0.01, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_nq(wp, sr, zsr, xq0, xs0, c0, iters, nt=nt):
            def body(i, c):
                y = w4a8_matmul_planes(xq0, xs0 + c, wp, sr, zsr,
                                       group=GROUP, n_tile=nt)
                return jnp.max(y) * 1e-9
            return jax.lax.fori_loop(0, iters, body, c0)

        timeit(nm, lambda c, it, w=(wp, sr, zsr, xq0, xs0):
               run_nq(*w, c, iters=it), jnp.float32(0.0), nbytes[base])

    # --- bytes-kernel variants (in-kernel bitcast unpack) + fused prologue
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_s4_pairs, pick_n_tile_s4, tile_scales_pairs, w4a8_matmul_bytes,
        w4a8_linear_bytes_fused,
    )

    def mk_bytes(key, oc, ic):
        codes = jax.random.randint(key, (oc, ic), 0, 16, jnp.int32)
        nt = pick_n_tile_s4(oc, ic)
        wb = pack_s4_pairs(codes, nt)
        s = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
        sr = tile_scales_pairs(s, nt).astype(jnp.bfloat16)
        zsr = tile_scales_pairs(jnp.zeros_like(s), nt).astype(jnp.bfloat16)
        return (wb, sr, zsr), wb.size + sr.size * 2 + zsr.size * 2

    bw, bnb = {}, {}
    for i, (nm, (oc, ic)) in enumerate(shapes.items()):
        if any(v.startswith(nm) and ("_b" in v or "_f" in v)
               for v in sizes):
            bw[nm], bnb[nm] = mk_bytes(ks[i + 4], oc, ic)

    for nm in list(shapes):
        # *_b: bytes kernel, XLA-side act quant glue (vs planes *)
        if f"{nm}_b" in sizes:
            oc, ic = shapes[nm]
            wb, sr, zsr = bw[nm]

            @functools.partial(jax.jit, static_argnames=("iters",))
            def run_b(wb, sr, zsr, x0, iters, ic=ic):
                def body(i, h):
                    hq, hs = quantize_act_per_token(h)
                    y = w4a8_matmul_bytes(hq, hs, wb, sr, zsr, group=GROUP)
                    rep = fold(y.astype(jnp.float32), ic)
                    return (rep * jax.lax.rsqrt(
                        jnp.mean(rep * rep, -1, keepdims=True) + 1e-6)
                    ).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, iters, body, x0)

            x0 = jax.random.normal(key, (B, shapes[nm][1]), jnp.bfloat16)
            timeit(f"{nm}_b", lambda a, it, w=(wb, sr, zsr):
                   run_b(*w, a, iters=it), x0, bnb[nm])

        # *_f: fully-fused bytes kernel (in-kernel rms+quant, bf16 out)
        if f"{nm}_f" in sizes:
            oc, ic = shapes[nm]
            wb, sr, zsr = bw[nm]

            @functools.partial(jax.jit, static_argnames=("iters",))
            def run_f(wp_, sr_, zsr_, x0, iters, ic=ic, nm=nm):
                from lightcompress_tpu.ops.pallas_matmul import (
                    w4a8_linear_planes_fused,
                )

                def body(i, h):
                    y = w4a8_linear_planes_fused(h, wp_, sr_, zsr_,
                                                 group=GROUP, rms=True)
                    rep = fold(y.astype(jnp.float32), ic)
                    return rep.astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, iters, body, x0)

            wpp, srp, zsrp, _ = weights[nm]
            x0 = jax.random.normal(key, (B, shapes[nm][1]), jnp.bfloat16)
            timeit(f"{nm}_f", lambda a, it, w=(wpp, srp, zsrp):
                   run_f(*w, a, iters=it), x0, nbytes[nm])

    # --- *_msk: mask-only unpack + bf16 dots (W4A16, no act-quant glue)
    from lightcompress_tpu.ops.pallas_matmul import (
        masked_zero_scales, pack_int4_planes_masked, tile_scales_masked,
        w4a16_matmul_planes_masked,
    )

    for nm in list(shapes):
        if f"{nm}_msk" not in sizes:
            continue
        oc, ic = shapes[nm]
        codes = jax.random.randint(ks[(hash(nm) % 4) + 4], (oc, ic), 0, 16,
                                   jnp.int32)
        nt = pick_n_tile(oc, ic // 8, GROUP)
        gpp = ic // 8 // GROUP
        wpm = tile_packed(pack_int4_planes_masked(codes), nt, GROUP)
        s = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
        z = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
        srm = tile_scales_masked(s, nt, gpp).astype(jnp.bfloat16)
        zsrm = tile_scales(masked_zero_scales(z, s, gpp), nt,
                           gpp).astype(jnp.bfloat16)
        nb = wpm.size * 4 + srm.size * srm.dtype.itemsize + zsrm.size * 2

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_m(wpm, srm, zsrm, x0, iters, ic=ic, nt=nt):
            def body(i, h):
                y = w4a16_matmul_planes_masked(h, wpm, srm, zsrm,
                                               group=GROUP, n_tile=nt)
                rep = fold(y, ic)
                return (rep * jax.lax.rsqrt(
                    jnp.mean(rep * rep, -1, keepdims=True) + 1e-6)
                ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, x0)

        x0 = jax.random.normal(key, (B, ic), jnp.bfloat16)
        timeit(f"{nm}_msk", lambda a, it, w=(wpm, srm, zsrm):
               run_m(*w, a, iters=it), x0, nb)

    # --- full layer (7 linears) — should reproduce bench_split's 453
    if "allsizes" in sizes:
        layer_bytes = (2 * nbytes["q"] + 2 * nbytes["kv"]
                       + 2 * nbytes["gate"] + nbytes["down"])

        @jax.jit
        def run_layer(x0):
            def body(i, h):
                q = one("q", h)
                k = one("kv", h)
                v = one("kv", h)
                o = one("q", q.astype(jnp.bfloat16))
                g = one("gate", h)
                u = one("gate", h)
                d = one("down", (jax.nn.silu(g.astype(jnp.float32))
                                 * u.astype(jnp.float32)
                                 ).astype(jnp.bfloat16))
                h2 = (d + o + jnp.mean(k) + jnp.mean(v)).astype(jnp.float32)
                return (h2 * jax.lax.rsqrt(
                    jnp.mean(h2 * h2, -1, keepdims=True) + 1e-6)
                ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, ITERS, body, x0)

        x0 = jax.random.normal(key, (B, HIDDEN), jnp.bfloat16)
        timeit("allsizes", run_layer, x0, layer_bytes)


if __name__ == "__main__":
    main()
