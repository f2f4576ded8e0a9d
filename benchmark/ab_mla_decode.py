"""MLA dense decode A/B (VERDICT #5): is the BlockSpec-paged mla_decode
kernel leaving bandwidth on the table vs the manual-DMA GQA engine?

Measures mla_decode at the recorded shape (H=16) and at real DSv3 geometry
(H=128), ctx 1024/8192, num_splits 1/2/4, plus a same-byte-count
paged_decode_dma run as the achievable-stream yardstick.

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 4800 python benchmark/ab_mla_decode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.attention.mla import mla_decode
from sgl_kernel_tpu.ops.attention.paged_decode_dma import paged_attention_decode_dma

rng = np.random.default_rng(0)
PAGE = 128


def timeit(step, carry, reps=64):
    @jax.jit
    def chain(n, c):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c).reshape(-1)[0]

    float(chain(jnp.int32(1), carry))

    def run(n):
        t0 = time.perf_counter()
        float(chain(jnp.int32(n), carry))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(4))
    t2 = min(run(1 + reps) for _ in range(4))
    return (t2 - t1) / reps


def bench_mla(b, ctx, h, splits=1, reps=64):
    blocks = ctx // PAGE
    n_pages = b * blocks + 1
    pool = jnp.asarray(rng.standard_normal((n_pages, PAGE, 576)) * 0.3, jnp.bfloat16)
    lengths = jnp.full((b,), ctx, jnp.int32)
    table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
    qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)

    def step(c):
        o = mla_decode(c, qp, pool, lengths, table, num_splits=splits)
        return c + o * jnp.bfloat16(1e-8)

    sec = timeit(step, qn, reps)
    gb = b * ctx * 576 * 2 / 1e9
    print(f"mla_decode B={b} ctx={ctx} H={h} splits={splits}: "
          f"{sec*1e6:.1f}us {gb/sec:.0f} GB/s", flush=True)
    return sec


def bench_dma_yardstick(b, ctx, reps=64):
    # GQA shape with the same per-seq KV byte count as MLA 576-latent:
    # Hkv=2 heads x D=128 x2(K+V) = 512B/token vs MLA 1152B -> use ctx*2.25
    hq, hkv, d = 16, 2, 128
    ctx_eq = int(ctx * 576 * 2 / (hkv * d * 2 * 2))
    ctx_eq = (ctx_eq // PAGE) * PAGE
    blocks = ctx_eq // PAGE
    n_pages = b * blocks + 1
    kp = jnp.asarray(rng.standard_normal((n_pages, hkv, PAGE, d)) * 0.3, jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_pages, hkv, PAGE, d)) * 0.3, jnp.bfloat16)
    lengths = jnp.full((b,), ctx_eq, jnp.int32)
    table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    def step(c):
        o = paged_attention_decode_dma(c, kp, vp, lengths, table)
        return c + o * jnp.bfloat16(1e-8)

    sec = timeit(step, q, reps)
    gb = b * ctx_eq * hkv * d * 2 * 2 / 1e9
    print(f"dma_yardstick B={b} ctx_eq={ctx_eq}: {sec*1e6:.1f}us {gb/sec:.0f} GB/s",
          flush=True)
    return sec


if __name__ == "__main__":
    for b, ctx, h in [(16, 1024, 16), (16, 1024, 128), (16, 8192, 16), (16, 8192, 128)]:
        for splits in ([1] if ctx == 1024 else [1, 2, 4]):
            try:
                bench_mla(b, ctx, h, splits, reps=32 if ctx == 8192 else 64)
            except Exception as e:
                print(f"FAIL B={b} ctx={ctx} H={h} s={splits}: {str(e)[:120]}", flush=True)
    bench_dma_yardstick(16, 1024)
    bench_dma_yardstick(16, 8192, reps=32)
