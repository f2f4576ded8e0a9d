"""Serving-level mixed prefill+decode bench: p50 per-tick decode latency
for a decode batch while a long prompt chunk-prefills, fused (mixed_step,
one dispatch + one weight stream) vs unfused (prefill chunk then decode as
two dispatches). Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 3000 python benchmark/bench_serving_mixed.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.serving import Engine


def run(enable_mixed: bool, cfg, params, rng):
    eng = Engine(cfg, params, num_pages=256, page_size=64, max_batch=8,
                 prefill_bucket=256, enable_prefix_cache=False,
                 prefill_chunk=256, enable_mixed=enable_mixed)
    for _ in range(8):
        eng.add_request(rng.integers(0, cfg.vocab_size, 16).tolist(), max_new_tokens=160)
    # warm the decode path
    for _ in range(12):
        eng.step()
    # admit a LONG prompt; measure tick latency while it chunk-prefills
    eng.add_request(rng.integers(0, cfg.vocab_size, 3072).tolist(), max_new_tokens=4)
    ticks = []
    while eng.prefilling or eng.waiting:
        t0 = time.perf_counter()
        eng.step()
        jax.block_until_ready(jax.tree.leaves(eng.caches)[0])
        ticks.append(time.perf_counter() - t0)
        if len(ticks) > 40:
            break
    eng.run_until_done(max_steps=400)
    return ticks


def main():
    rng = np.random.default_rng(0)
    cfg = llama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=16, num_heads=16, num_kv_heads=8, head_dim=128,
        max_position=8192, quant="w4a16", group_size=128, fused=True,
    )
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    for tag, en in (("unfused", False), ("fused", True)):
        ticks = run(en, cfg, params, rng)
        p50 = float(np.percentile(ticks, 50)) if ticks else float("nan")
        print(json.dumps({"name": f"serving_mixed:{tag}",
                          "p50_tick_ms": round(p50 * 1e3, 2),
                          "ticks": len(ticks)}), flush=True)


if __name__ == "__main__":
    main()
