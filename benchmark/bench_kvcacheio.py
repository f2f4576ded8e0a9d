#!/usr/bin/env python
"""KV-cache layout-transfer bandwidth grid (reference analog: the kvcacheio
suite, tests/test_kvcacheio.py + transfer benchmark loops; HiCache data
plane)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops import kvcache

records = []
rng = np.random.default_rng(0)

L, T, H, D = 32, 8192, 8, 128  # 16 MB per layer pool slab at bf16
N_MOVE = 2048


def add(name, sec, moved_bytes):
    records.append(report(name, sec, gbs=round(moved_bytes / sec / 1e9, 1)))


def main():
    src_idx = jnp.asarray(rng.permutation(T)[:N_MOVE], jnp.int32)
    dst_idx = jnp.asarray(rng.permutation(T)[:N_MOVE], jnp.int32)

    # per-layer lf->lf
    sk = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    sv = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    dk = jnp.zeros_like(sk)
    dv = jnp.zeros_like(sv)

    def step(carry):
        dk_, dv_ = carry
        dk_, dv_ = kvcache.transfer_kv_per_layer(sk, sv, dk_, dv_, src_idx, dst_idx)
        return (dk_ + jnp.bfloat16(0), dv_)

    sec = bench_chain(step, (dk, dv), reps=32)
    add(f"transfer_kv_per_layer:{N_MOVE}-{H}-{D}", sec, 4 * N_MOVE * H * D * 2)

    # all-layer lf->lf
    skl = jnp.asarray(rng.standard_normal((L, T // 8, H, D)), jnp.bfloat16)
    svl = jnp.asarray(rng.standard_normal((L, T // 8, H, D)), jnp.bfloat16)
    dkl = jnp.zeros_like(skl)
    dvl = jnp.zeros_like(svl)
    si = jnp.asarray(rng.permutation(T // 8)[:256], jnp.int32)
    di = jnp.asarray(rng.permutation(T // 8)[:256], jnp.int32)

    def step2(carry):
        a, b = kvcache.transfer_kv_all_layer(skl, svl, carry[0], carry[1], si, di)
        return (a, b)

    sec = bench_chain(step2, (dkl, dvl), reps=16)
    add(f"transfer_kv_all_layer:{L}-256-{H}-{D}", sec, 4 * L * 256 * H * D * 2)

    # MLA variants
    sm = jnp.asarray(rng.standard_normal((T, 576)), jnp.bfloat16)
    dm = jnp.zeros_like(sm)
    sec = bench_chain(lambda c: kvcache.transfer_kv_per_layer_mla(sm, c, src_idx, dst_idx) + jnp.bfloat16(0),
                      dm, reps=32)
    add(f"transfer_kv_per_layer_mla:{N_MOVE}-576", sec, 2 * N_MOVE * 576 * 2)

    sml = jnp.asarray(rng.standard_normal((L, T // 8, 576)), jnp.bfloat16)
    dml = jnp.zeros_like(sml)
    sec = bench_chain(lambda c: kvcache.transfer_kv_all_layer_mla(sml, c, si, di) + jnp.bfloat16(0),
                      dml, reps=16)
    add(f"transfer_kv_all_layer_mla:{L}-256-576", sec, 2 * L * 256 * 576 * 2)

    # lf -> pf staging and back
    pf = jnp.zeros((T // 8, 2 * L, H * D), jnp.bfloat16)
    skf = skl.reshape(L, T // 8, H * D)
    svf = svl.reshape(L, T // 8, H * D)

    def step3(c):
        return kvcache.transfer_kv_all_layer_lf_pf(skf, svf, c, si, di) + jnp.bfloat16(0)

    sec = bench_chain(step3, pf, reps=16)
    add(f"transfer_kv_all_layer_lf_pf:{L}-256", sec, 4 * L * 256 * H * D * 2)

    def step4(carry):
        a, b = kvcache.transfer_kv_per_layer_pf_lf(
            pf, carry[0], carry[1], si, di, jnp.int32(3))
        return (a, b)

    sec = bench_chain(step4, (jnp.zeros((T // 8, H * D), jnp.bfloat16),
                              jnp.zeros((T // 8, H * D), jnp.bfloat16)), reps=16)
    add(f"transfer_kv_per_layer_pf_lf:256", sec, 2 * 256 * H * D * 2)

    # page-head pool whole-page moves
    page = 64
    ph = jnp.zeros((64, H, page, 2 * L, D), jnp.bfloat16)
    spg = jnp.asarray(rng.permutation(T // page)[:32], jnp.int32)
    dpg = jnp.asarray(rng.permutation(64)[:32], jnp.int32)
    skl4 = skl.reshape(L, T // 8, H, D)

    def step5(c):
        return kvcache.transfer_kv_all_layer_lf_ph(
            jnp.asarray(skl4), jnp.asarray(svl), c, spg % (T // 8 // page), dpg, page
        ) + jnp.bfloat16(0)

    sec = bench_chain(step5, ph, reps=8)
    add(f"transfer_kv_all_layer_lf_ph:{L}-32p{page}", sec, 4 * L * 32 * page * H * D * 2)

    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
