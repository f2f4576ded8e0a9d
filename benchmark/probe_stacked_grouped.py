#!/usr/bin/env python
"""Why is the in-model (layer-stacked) grouped GEMM ~530 GB/s when the
unstacked sweep measures 700-805 on the same shape? Variants at the
V2-Lite gate_up decode geometry (bm=16, 51 valid + 15 trailing blocks,
L=26 traced-lid layer loop):

  unstacked      — sweep form, single bank, valid blocks only
  stacked        — [L, E, ...] double-None BlockSpec (the model form)
  stacked_nv     — + num_valid_blocks trailing clamp
  flat_nv        — bank flattened to [L*E, ...], expert index = lid*E + e
                   computed on the HOST per layer (single None-squeeze)
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, report
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4
from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

E, N, K, BM, L = 64, 2816, 2048, 16, 26
NB, NV = 66, 51


def main():
    rng = np.random.default_rng(0)
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.bfloat16) * 0.02
    pk, sc, _ = quantize_w4(w, group_size=128)
    pk_s = jnp.tile(pk[None, None], (L, E, 1, 1))
    sc_s = jnp.tile(sc[None, None], (L, E, 1, 1))
    pk_e = jnp.tile(pk[None], (E, 1, 1))
    sc_e = jnp.tile(sc[None], (E, 1, 1))
    pk_f = pk_s.reshape(L * E, K // 2, N)
    sc_f = sc_s.reshape(L * E, K // 128, N)
    perm = rng.permutation(E)
    eids = jnp.asarray(np.concatenate([perm[:NV], np.full(NB - NV, perm[NV - 1])]),
                       jnp.int32)
    x = jnp.asarray(rng.standard_normal((NB * BM, K)) * 0.1, jnp.bfloat16)
    bank = NV * (K // 2 * N + (K // 128) * N * 2)
    nv = jnp.int32(NV)

    def run(tag, step, args, scale=1):
        sec = bench_chain(step, x, reps=max(8, 64 // scale), args=args,
                          bytes_per_step=bank * scale) / scale
        report(f"probe_stacked:{tag}", sec, bank_gbs=round(bank / sec / 1e9, 1))

    # unstacked single bank (the sweep form)
    def u_step(c, pk, sc):
        o = w4a16_grouped_mm(c, pk, sc, eids, num_valid_blocks=nv,
                             group_size=128, bm=BM)
        return c + o[:, :1] * jnp.bfloat16(1e-6)

    run("unstacked_nv", u_step, (pk_e, sc_e))

    # stacked, traced-lid layer loop (the model form), no clamp
    def s_step(c, pk_s, sc_s):
        def layer(lid, c):
            o = w4a16_grouped_mm(c, pk_s, sc_s, eids, layer_id=lid,
                                 group_size=128, bm=BM)
            return c + o[:, :1] * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    run("stacked", s_step, (pk_s, sc_s), scale=L)

    # stacked + trailing clamp
    def sn_step(c, pk_s, sc_s):
        def layer(lid, c):
            o = w4a16_grouped_mm(c, pk_s, sc_s, eids, layer_id=lid,
                                 num_valid_blocks=nv, group_size=128, bm=BM)
            return c + o[:, :1] * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    run("stacked_nv", sn_step, (pk_s, sc_s), scale=L)

    # flattened bank: expert row = lid * E + eids (host add, single squeeze)
    def f_step(c, pk_f, sc_f):
        def layer(lid, c):
            o = w4a16_grouped_mm(c, pk_f, sc_f, eids + lid * E,
                                 num_valid_blocks=nv, group_size=128, bm=BM)
            return c + o[:, :1] * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    run("flat_nv", f_step, (pk_f, sc_f), scale=L)


if __name__ == "__main__":
    main()
