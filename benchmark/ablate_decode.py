"""Per-stage ablation of the headline decode step (bench.py workload).

Each variant monkeypatches ONE stage out of llama.decode_step and runs the
exact bench.py differenced-rep timing, so (full - ablated) is that stage's
real in-model cost — the round-2 methodology that found the 7 ms scatter
(docs/PERF.md). Run one variant per invocation (remote compiles serialize):

  flock /tmp/tpu.lock timeout 3000 python benchmark/ablate_decode.py full
  variants: full nostore noattn nolmhead nonorm norope

NOTE: ablated variants compute garbage tokens — only the timing is valid.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.ops import kvcache

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

if VARIANT == "nostore":
    llama.store_cache_all_layers = lambda k, v, kc, vc, loc: (kc, vc)
elif VARIANT == "noattn":
    def _fake_attn(q, kc, vc, lengths, tables, layer_id=None, fresh_k=None,
                   fresh_v=None, **kw):
        return q * jnp.bfloat16(1e-3)
    llama.paged_attention_decode_dma = _fake_attn
elif VARIANT == "nolmhead":
    _real_linear = llama._linear
    def _linear(x, w, cfg, residual=None, layer_id=None):
        # the lm_head is the only >100k-wide matrix reached with layer_id=None
        if layer_id is None and isinstance(w, dict) and w["packed"].shape[-1] > 100000:
            return jnp.zeros((x.shape[0], w["packed"].shape[-1]), jnp.float32)
        return _real_linear(x, w, cfg, residual=residual, layer_id=layer_id)
    llama._linear = _linear
elif VARIANT == "nonorm":
    llama.rmsnorm = lambda x, w, eps=1e-6, **kw: x
elif VARIANT == "norope":
    llama.rope_decode_fused = lambda pos, q, k, cache: (q, k)
elif VARIANT == "noscankv":
    # the deferred store's inputs are scan-STACKED (k, v) outputs — two
    # dynamic-update-slices per layer the nostore variant still pays.
    # Reimplement the loop without ys to measure that cost.
    _orig = llama.decode_layers

    def decode_layers(lw, cfg, k_cache, v_cache, x, positions, page_tables,
                      lengths, slot_loc, rope_cache, *, tp_axis=None):
        b = x.shape[0]
        n_stack = jax.tree_util.tree_leaves(lw)[0].shape[0]

        def layer_fn(carry, lidx):
            x = carry
            h = llama.rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
            qkv = llama._linear(h, lw["qkv"], cfg, layer_id=lidx)
            q, k, v = llama.rope_decode_fused_qkv(
                positions, qkv, rope_cache, num_q=cfg.num_heads,
                num_kv=cfg.num_kv_heads, head_dim=cfg.head_dim)
            attn = llama.paged_attention_decode_dma(
                q, k_cache, v_cache, lengths, page_tables, layer_id=lidx,
                fresh_k=k, fresh_v=v)
            x = llama._linear(attn.reshape(b, -1), lw["o"], cfg, residual=x, layer_id=lidx)
            h2 = llama.rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = llama._mlp(h2, lw, cfg, residual=x, layer_id=lidx)
            return x, None

        x, _ = jax.lax.scan(layer_fn, x, jnp.arange(n_stack))
        return x, k_cache, v_cache

    llama.decode_layers = decode_layers

# run bench.py's main with the patched module state
sys.argv = [sys.argv[0]]
import importlib
bench = importlib.import_module("bench")
t0 = time.time()
bench.main()
print(f"# variant={VARIANT} wall={time.time()-t0:.0f}s", flush=True)
