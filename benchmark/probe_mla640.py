#!/usr/bin/env python
"""On-chip probe: 640-lane (padded) MLA latent pool under the manual-DMA
engine (VERDICT r4 #6's split-pool idea, done as ONE pool: 576 data lanes
+ 64 zero lanes = 5x128 — every DMA slice and VMEM lane slice is aligned,
so the typed rows stream directly and the u8-view bitcast decode that
Mosaic rejects is not needed at all).

Probes, in order:
  1. typed [page, 640] DMA + q@kv dot + kv[:, :512] V-slice lowers?
  2. timed mini-kernel vs byte count (is it in the GQA engine's ~850 class?)
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DP = 640
DL = 512


def kernel(q_ref, kv_hbm, o_ref, kb, sem, acc, *, n_pages, page):
    def dma(p, slot):
        return pltpu.make_async_copy(kv_hbm.at[p], kb.at[slot], sem.at[slot])

    dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)

    def body(p, _):
        @pl.when(p + 1 < n_pages)
        def _nxt():
            dma(p + 1, jax.lax.rem(p + 1, 2)).start()

        slot = jax.lax.rem(p, 2)
        dma(p, slot).wait()
        kv = kb[slot]  # [page, 640] typed
        sc = jax.lax.dot_general(q_ref[...], kv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p_ = jax.nn.softmax(sc, axis=1)
        v = kv[:, :DL]
        acc[...] += jax.lax.dot(p_.astype(v.dtype), v,
                                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_pages, body, 0)
    o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_pages", "page"))
def run(q, kv, *, n_pages, page):
    return pl.pallas_call(
        functools.partial(kernel, n_pages=n_pages, page=page),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], DL), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, page, DP), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((q.shape[0], DL), jnp.float32)],
    )(q, kv)


def main():
    page, n_pages, gp = 128, 1024, 128  # 160 MB pool, H=128-class q
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((gp, DP)) * 0.1, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((n_pages, page, DP)) * 0.1, jnp.bfloat16)
    try:
        o = run(q, kv, n_pages=n_pages, page=page)
        print("probe1 lowered OK:", o.shape, float(jnp.mean(o.astype(jnp.float32))))
    except Exception as e:
        print(f"probe1 FAILED: {type(e).__name__}: {str(e)[:400]}")
        return

    # timing: differenced traced-rep chain
    @jax.jit
    def chain(n, q, kv):
        def body(i, c):
            o = run(c, kv, n_pages=n_pages, page=page)
            return c.at[:, :DL].add(o * jnp.bfloat16(1e-6))

        return jax.lax.fori_loop(0, n, body, q)[0, 0]

    _ = float(chain(jnp.int32(1), q, kv))

    def t(n):
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(n), q, kv))
        return time.perf_counter() - t0

    _ = t(1)
    t1 = min(t(1) for _ in range(4))
    t2 = min(t(17) for _ in range(4))
    sec = (t2 - t1) / 16
    byts = n_pages * page * DP * 2
    print(f"probe2: {sec*1e3:.3f} ms/step, {byts/sec/1e9:.1f} GB/s "
          f"({byts*576//DP/sec/1e9:.1f} GB/s useful-576)")


if __name__ == "__main__":
    main()
