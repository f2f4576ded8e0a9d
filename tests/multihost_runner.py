"""Per-process runner for the multi-host (2 hosts x 4 devices) CPU test.

Launched by tests/test_multihost.py as N separate OS processes; each
initializes jax.distributed against a localhost coordinator, builds the
hybrid dp(DCN) x tp(ICI) mesh, runs one TP llama decode step, and dumps
its dp shard of the logits for the parent to cross-check against the
single-process oracle.

Usage: python multihost_runner.py <proc_id> <num_procs> <port> <outdir>
"""

import os
import sys

proc_id, num_procs, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sgl_kernel_tpu.parallel.multihost import init_distributed, make_hybrid_mesh  # noqa: E402

init_distributed(f"localhost:{port}", num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == num_procs * 4

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from sgl_kernel_tpu.models import llama  # noqa: E402
from sgl_kernel_tpu.parallel import tp as tp_lib  # noqa: E402

mesh = make_hybrid_mesh({"dp": num_procs}, {"tp": 4})

cfg = llama.LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
    max_position=64, dtype=jnp.float32, fused=False,
)
params = llama.init_weights(cfg, jax.random.PRNGKey(0))
page, npages, b = 8, 2 * num_procs, 2 * num_procs
kc, vc = llama.make_caches(cfg, num_pages=npages, page_size=page)
rope = llama.build_rope_cache(cfg)
tokens = np.arange(b, dtype=np.int32) % cfg.vocab_size
positions = np.zeros(b, np.int32)
tables = (np.arange(b) % npages).reshape(b, 1).astype(np.int32)
lengths = np.ones(b, np.int32)
slots = (tables[:, 0] * page).astype(np.int32)


def globalize(x, spec):
    sharding = NamedSharding(mesh, spec)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


pspecs = tp_lib._param_specs(params)
params_g = jax.tree.map(globalize, params, pspecs)
cache_spec = tp_lib._cache_spec()
step = tp_lib.make_parallel_decode_step(cfg, mesh, params)
logits, _, _ = jax.jit(step)(
    params_g, globalize(kc, cache_spec), globalize(vc, cache_spec),
    globalize(tokens, P("dp")), globalize(positions, P("dp")),
    globalize(tables, P("dp", None)), globalize(lengths, P("dp")),
    globalize(slots, P("dp")), globalize(rope, P(None, None)),
)
jax.block_until_ready(logits)

# each process owns the dp rows for its host block; the 4 tp-replicated
# device shards carry identical data -> dedup by row index
by_index = {}
for s in logits.addressable_shards:
    by_index[s.index[0].start or 0] = np.asarray(s.data)
local = np.concatenate([by_index[k] for k in sorted(by_index)])
np.save(os.path.join(outdir, f"logits_p{proc_id}.npy"), local)
print(f"proc {proc_id}: OK local logits {local.shape}")
