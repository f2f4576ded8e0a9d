"""Confirm pass for the W4A16 tile tuner with noise-proof differencing.

The first tuner run's 32-rep differencing was under the relay's per-call
jitter (negative and >2 TB/s readings). This pass uses 256-rep differencing
(~10-300 ms of kernel work per sample, >>ms-scale jitter) and re-sweeps the
candidate set per (shape, M bucket), printing a validated _TILE_TABLE.

Run alone on the bench chip:  timeout 5400 python benchmark/confirm_w4a16.py
"""
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm, _m_bucket

rng = np.random.default_rng(0)
G = 128

# Llama-3-8B TP=1 shapes: fused qkv, o, fused gate_up, down.
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
MS = [16, 128, 1024]
DEFAULT = lambda m: (min(256, max(8, m)), 2048, 1024)


def bench(m, n, k, bm, bn, bk, reps=256):
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (1, k // 2, n)), jnp.uint8)
    sc = jnp.asarray((rng.random((1, k // G, n)) * 0.01).astype(np.float32))

    @jax.jit
    def chain(reps, a):
        def body(i, c):
            o = w4a16_gemm(c, pk, sc, layer_id=i * 0, group_size=G,
                           bm=bm, bn=bn, bk=bk)
            w_ = min(n, k)
            return c.at[:, :w_].add(o[:m, :w_].astype(c.dtype) * jnp.bfloat16(1e-8))
        return jax.lax.fori_loop(0, reps, body, a).reshape(-1)[0]

    float(chain(jnp.int32(1), a))  # compile + warm

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), a))
        return time.perf_counter() - t0

    run(8)
    t1 = min(run(8) for _ in range(3))
    t2 = min(run(8 + reps) for _ in range(3))
    return (t2 - t1) / reps


def main():
    table = {}
    for (n, k), m in itertools.product(SHAPES, MS):
        cands = {DEFAULT(m)}
        bms = [min(256, max(8, m))] if m <= 256 else [256]
        for bm, bn, bk in itertools.product(bms, [512, 1024, 2048, 4096], [1024, 2048]):
            if n % bn == 0 and k % bk == 0:
                cands.add((bm, bn, bk))
        best = None
        dflt_t = None
        # fewer reps for the slow large-M shapes to bound wall time
        reps = 256 if m <= 128 else 64
        for cfg in sorted(cands):
            try:
                sec = bench(m, n, k, *cfg, reps=reps)
            except Exception as e:
                print(f"M={m} N={n} K={k} {cfg} FAIL {str(e)[:60]}", flush=True)
                continue
            gbs = (n * k // 2 + (k // G) * n * 4 + 2 * m * k) / sec / 1e9
            tf = 2 * m * n * k / sec / 1e12
            print(f"M={m} N={n} K={k} {cfg}: {sec*1e6:.1f}us {gbs:.0f}GB/s "
                  f"{tf:.0f}TFLOP/s", flush=True)
            if cfg == DEFAULT(m):
                dflt_t = sec
            if best is None or sec < best[0]:
                best = (sec, cfg)
        if best and dflt_t and best[0] < dflt_t * 0.97 and best[1] != DEFAULT(m):
            table[(n, k, _m_bucket(m))] = best[1]
    print("\n# validated entries (beat default by >3%)")
    print("_TILE_TABLE = {")
    for key, val in sorted(table.items()):
        print(f"    {key}: {val},")
    print("}")


if __name__ == "__main__":
    main()
