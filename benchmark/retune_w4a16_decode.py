"""Decode-bucket (M=16) tile retune for the K-paired W4A16 kernel.

Uses the HONEST in-model harness (docs/PERF.md round 2): 32 distinct
layer-stacked weight slices with a TRACED layer_id per rep, so no weight
goes VMEM/cache-resident and tile orderings match the real model. Isolated
single-weight rep chains invert tile orderings — do not use them for the
decode bucket.

Relay hygiene: weights are created ONCE per shape and passed as jit args
(a closure constant embeds ~1GB in the HLO -> remote-compile HTTP 413; a
fresh array per tile config re-uploads ~1GB per config through the relay).

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 3600 python benchmark/retune_w4a16_decode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm

rng = np.random.default_rng(0)
G = 128
L = 32
M = 16

# Llama-3-8B TP=1 decode shapes: fused qkv, o, fused gate_up, down.
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
CANDS = [(2048, 1024), (1024, 1024), (4096, 1024), (2048, 2048)]


def bench(a, pk, sc, n, k, bn, bk):
    @jax.jit
    def chain(reps, a, pk, sc):
        def rep(r, c):
            def layer(i, c):
                o = w4a16_gemm(c, pk, sc, layer_id=i, group_size=G,
                               bm=M, bn=bn, bk=bk)
                w_ = min(n, k)
                return c.at[:, :w_].add(o[:M, :w_].astype(c.dtype) * jnp.bfloat16(1e-8))
            return jax.lax.fori_loop(0, L, layer, c)
        return jax.lax.fori_loop(0, reps, rep, a).reshape(-1)[0]

    float(chain(jnp.int32(1), a, pk, sc))  # compile + warm (forces host transfer)

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), a, pk, sc))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(9) for _ in range(3))
    sec = (t2 - t1) / 8 / L
    gbs = (k // 2 * n + (k // G) * n * 2) / sec / 1e9
    return sec, gbs


def main():
    table = {}
    for n, k in SHAPES:
        a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
        pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
        sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
        jax.block_until_ready((a, pk, sc))  # one relay upload per shape
        best = None
        for bn, bk in CANDS:
            if bn > n or bk > k:
                continue
            try:
                sec, gbs = bench(a, pk, sc, n, k, bn, bk)
            except Exception as e:  # Mosaic/relay rejects some tilings
                print(f"N={n} K={k} bn={bn} bk={bk}: FAIL {str(e)[:70]}", flush=True)
                continue
            print(f"N={n} K={k} bn={bn} bk={bk}: {sec*1e6:.1f}us {gbs:.0f}GB/s", flush=True)
            if gbs > 819:  # above HBM peak -> measurement artifact, distrust
                print("  ^ above HBM peak, ignoring", flush=True)
                continue
            if best is None or sec < best[0]:
                best = (sec, gbs, bn, bk)
        if best:
            sec, gbs, bn, bk = best
            table[(n, k, 0)] = (M, bn, bk)
            print(f"BEST N={n} K={k}: ({M}, {bn}, {bk})  # {gbs:.0f} GB/s in-model", flush=True)
    print("\n_TILE_TABLE decode entries:")
    for key, val in table.items():
        print(f"    {key}: {val},")


if __name__ == "__main__":
    main()
