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

# run bench.py's main with the patched module state
sys.argv = [sys.argv[0]]
import importlib
bench = importlib.import_module("bench")
t0 = time.time()
bench.main()
print(f"# variant={VARIANT} wall={time.time()-t0:.0f}s", flush=True)
