"""On-chip tile/decode-mode sweep for the round-4 fp8_blockwise_scaled_mm.

Honest-residency pattern (docs/PERF.md round 2: single-weight rep chains
go VMEM/cache-resident and report impossible rates): each rep streams L
DISTINCT weight banks (L * K * N fp8 bytes >> VMEM), unrolled in the chain
body so no per-layer HBM slice copy pollutes the stream.

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 5400 python benchmark/sweep_blockwise_fp8.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.blockwise_fp8 import (
    fp8_blockwise_scaled_mm,
    prepare_blockwise_scales,
)

rng = np.random.default_rng(0)
BLOCK = 128


def bench(m, n, k, L, bm, bn, bk, decode, gmode="inner", reps=None):
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32).astype(jnp.float8_e4m3fn)
    sa = jnp.asarray(rng.random((m, k // BLOCK)) * 0.01 + 0.001, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((k, n)), jnp.float32).astype(jnp.float8_e4m3fn)
          for _ in range(L)]
    sbs = [prepare_blockwise_scales(
        jnp.asarray(rng.random((k // BLOCK, n // BLOCK)) * 0.01 + 0.001, jnp.float32))
        for _ in range(L)]
    jax.block_until_ready((a, sa, ws, sbs))
    wcols = min(n, k)

    @jax.jit
    def chain(r, a, sa, *banks):
        ws, sbs = banks[:L], banks[L:]

        def rep(_, c):
            for i in range(L):
                o = fp8_blockwise_scaled_mm(
                    c, ws[i], sa, sbs[i], out_dtype=jnp.float8_e4m3fn,
                    bm=bm, bn=bn, bk=bk, decode=decode, gmode=gmode)
                upd = jax.lax.bitcast_convert_type(o[:, :wcols], jnp.uint8) & 1
                cu = jax.lax.bitcast_convert_type(c, jnp.uint8)
                cu = cu.at[:, :wcols].set(cu[:, :wcols] ^ upd)
                c = jax.lax.bitcast_convert_type(cu, jnp.float8_e4m3fn)
            return c

        return jax.lax.fori_loop(0, r, rep, a).reshape(-1)[0].astype(jnp.float32)

    args = (a, sa, *ws, *sbs)
    float(chain(jnp.int32(1), *args))

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), *args))
        return time.perf_counter() - t0

    run(1)
    reps = reps or max(4, 128 // L)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(1 + reps) for _ in range(3))
    sec = (t2 - t1) / reps / L
    bytes_l = k * n + (k // BLOCK) * n * 4 + m * k + m * n
    gbs = bytes_l / sec / 1e9
    tflops = 2 * m * n * k / sec / 1e12
    print(f"bw_fp8 {decode}/{gmode} M={m} N={n} K={k} bm={bm} bn={bn} bk={bk}: "
          f"{sec*1e6:.1f}us {gbs:.0f}GB/s {tflops:.1f}TF", flush=True)
    return sec


# Round-3 sweep. Round-2 (L=16, honest residency): decode 4096x4096
# inner 652 / inner2 918 GB/s (multi-accumulator wins big on decode);
# K=7168 inner 504, N=7168 inner 790; prefill inner/bn=4096 138.5 TF
# (inner2 ties, prescale 88-117 loses, inner4 + bk=2048 + bm=512 all
# crash remote Mosaic HTTP 500). This round: inner2 across the decode
# shapes, and the HONEST prefill targets — the bf16 matmul and the
# per-tensor fp8_scaled_mm at the SAME shape in the SAME L-bank harness
# (the 196 TF peak was measured at 4096^3; "within 15%" must compare
# against the same-M ceiling).
SWEEPS = [
    (16, 4096, 4096, 16, [("pair", "inner2", 16, 4096, 1024),
                          ("pair", "inner2", 16, 2048, 1024)]),
    (16, 4096, 7168, 16, [("pair", "inner2", 16, 4096, 1024)]),
    (16, 7168, 4096, 16, [("pair", "inner2", 16, 7168, 1024)]),
    (1024, 4096, 4096, 8, [("pair", "inner2", 256, 4096, 1024)]),
]


def bench_bf16(m, n, k, L, reps=16):
    """Same-harness bf16 matmul: the honest prefill TFLOP/s ceiling."""
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16) for _ in range(L)]
    jax.block_until_ready((a, ws))

    @jax.jit
    def chain(r, a, *ws):
        def rep(_, c):
            for i in range(L):
                o = jnp.dot(c, ws[i], preferred_element_type=jnp.float32)
                c = c + o[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            return c
        return jax.lax.fori_loop(0, r, rep, a).reshape(-1)[0].astype(jnp.float32)

    args = (a, *ws)
    float(chain(jnp.int32(1), *args))

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), *args))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(1 + reps) for _ in range(3))
    sec = (t2 - t1) / reps / L
    print(f"bf16_mm M={m} N={n} K={k}: {sec*1e6:.1f}us "
          f"{2*m*n*k/sec/1e12:.1f}TF", flush=True)


def bench_fp8_scaled(m, n, k, L, reps=16):
    from sgl_kernel_tpu.ops.gemm.scaled_mm import fp8_scaled_mm

    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32).astype(jnp.float8_e4m3fn)
    ws = [jnp.asarray(rng.standard_normal((k, n)), jnp.float32).astype(jnp.float8_e4m3fn)
          for _ in range(L)]
    sa = jnp.float32(0.01)
    jax.block_until_ready((a, ws))

    @jax.jit
    def chain(r, a, *ws):
        def rep(_, c):
            for i in range(L):
                o = fp8_scaled_mm(c, ws[i], sa, sa, out_dtype=jnp.bfloat16)
                u = jax.lax.bitcast_convert_type(c, jnp.uint8)
                upd = (o[:, :k] > 0).astype(jnp.uint8)
                c = jax.lax.bitcast_convert_type(u ^ upd, jnp.float8_e4m3fn)
            return c
        return jax.lax.fori_loop(0, r, rep, a).reshape(-1)[0].astype(jnp.float32)

    args = (a, *ws)
    float(chain(jnp.int32(1), *args))

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), *args))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(1 + reps) for _ in range(3))
    sec = (t2 - t1) / reps / L
    print(f"fp8_scaled_mm M={m} N={n} K={k}: {sec*1e6:.1f}us "
          f"{2*m*n*k/sec/1e12:.1f}TF", flush=True)

if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for m, n, k, L, cands in SWEEPS:
        if only and only not in (f"{m}", f"{m}-{n}-{k}"):
            continue
        for decode, gmode, bm, bn, bk in cands:
            try:
                bench(m, n, k, L, bm, bn, bk, decode, gmode)
            except Exception as e:
                print(f"bw_fp8 {decode}/{gmode} M={m} N={n} K={k} bm={bm} bn={bn} "
                      f"bk={bk} FAIL {str(e)[:140]}", flush=True)
    if only in (None, "ceilings"):
        for fn in (bench_bf16, bench_fp8_scaled):
            try:
                fn(1024, 4096, 4096, 8)
            except Exception as e:
                print(f"{fn.__name__} FAIL {str(e)[:140]}", flush=True)
