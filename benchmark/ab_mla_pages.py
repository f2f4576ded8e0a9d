"""MLA decode page-size scaling: the BlockSpec pipeline's per-step cost
amortizes with bigger pages (zero kernel change)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from sgl_kernel_tpu.ops.attention.mla import mla_decode
rng = np.random.default_rng(0)

def bench(b, ctx, h, page, reps=64):
    blocks = max(1, ctx // page)
    n_pages = b * blocks + 1
    pool = jnp.asarray(rng.standard_normal((n_pages, page, 576)) * 0.3, jnp.bfloat16)
    lengths = jnp.full((b,), ctx, jnp.int32)
    table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
    qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)

    @jax.jit
    def chain(n, c):
        def body(i, c):
            o = mla_decode(c, qp, pool, lengths, table)
            return c + o * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, n, body, c).reshape(-1)[0]

    float(chain(jnp.int32(1), qn))
    def run(n):
        t0 = time.perf_counter()
        float(chain(jnp.int32(n), qn))
        return time.perf_counter() - t0
    run(1)
    t1 = min(run(1) for _ in range(4))
    t2 = min(run(1 + reps) for _ in range(4))
    sec = (t2 - t1) / reps
    gb = b * ctx * 576 * 2 / 1e9
    print(f"page={page} B={b} ctx={ctx} H={h}: {sec*1e6:.1f}us {gb/sec:.0f} GB/s", flush=True)

for page in (128, 512, 1024, 2048):
    for b, ctx, h in [(16, 8192, 16), (16, 8192, 128)]:
        if ctx >= page:
            try:
                bench(b, ctx, h, page, reps=32)
            except Exception as e:
                print(f"FAIL page={page} {b}-{ctx}-{h}: {str(e)[:150]}", flush=True)
for page in (512, 1024):
    bench(16, 1024, 16, page)
