"""Multi-host execution tests.

Two layers of coverage (SURVEY §2.4 / VERDICT round-1 gap #2):
  1. In-process: hybrid DCN x ICI mesh construction + the compiled-HLO
     guarantee that the TP decode step's collectives never cross host
     (ICI-block) boundaries.
  2. True multi-process: 2 OS processes x 4 CPU devices each, joined by
     jax.distributed over a localhost coordinator, running the dp(DCN) x
     tp(ICI) llama decode step; per-process dp shards must match the
     single-process full-batch oracle.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.parallel import tp as tp_lib
from sgl_kernel_tpu.parallel.multihost import (
    assert_no_dcn_collectives,
    collective_inventory,
    make_hybrid_mesh,
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestHybridMesh:
    def test_pseudo_host_blocks(self):
        mesh = make_hybrid_mesh({"dp": 2}, {"tp": 4})
        assert mesh.shape == {"dp": 2, "tp": 4}
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        # each dp row is one contiguous 4-device ICI block
        assert ids[0].tolist() == [0, 1, 2, 3]
        assert ids[1].tolist() == [4, 5, 6, 7]

    def test_three_axis(self):
        mesh = make_hybrid_mesh({"dp": 2}, {"tp": 2, "sp": 2})
        assert mesh.shape == {"dp": 2, "tp": 2, "sp": 2}

    def test_tp_collectives_stay_on_ici(self):
        """Compile the dp x tp decode step on the hybrid mesh and verify no
        collective replica group spans two pseudo-hosts."""
        mesh = make_hybrid_mesh({"dp": 2}, {"tp": 4})
        cfg = llama.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
            max_position=64, dtype=jnp.float32,
        )
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        page, npages, b = 8, 4, 4
        kc, vc = llama.make_caches(cfg, num_pages=npages, page_size=page)
        rope = llama.build_rope_cache(cfg)
        step = tp_lib.make_parallel_decode_step(cfg, mesh, params)
        tokens = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray((np.arange(b) % npages).reshape(b, 1), jnp.int32)
        compiled = jax.jit(step).lower(
            params, kc, vc, tokens, tokens, tables, jnp.ones(b, jnp.int32),
            (tables[:, 0] * page).astype(jnp.int32), rope,
        ).compile()
        assert_no_dcn_collectives(compiled, mesh, n_ici=4)

        # structured artifact form of the same guarantee (the BASELINE.md
        # scaling evidence): every collective stays inside one ICI block
        inv = collective_inventory(compiled, mesh, n_ici=4)
        assert inv, "tp decode must contain collectives (the o-proj psum)"
        for rec in inv:
            assert rec["ici_only"], rec
            assert rec["count"] > 0 and rec["group_sizes"], rec
        assert any(rec["op"] == "all-reduce" for rec in inv), inv

    def test_ep_collectives_stay_on_ici(self):
        """EP fused_experts (all-to-all token dispatch) over the tp axis of
        the hybrid mesh: the a2a + combine must ride ICI, never DCN."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from sgl_kernel_tpu.ops import moe
        from sgl_kernel_tpu.parallel import ep as ep_lib

        mesh = make_hybrid_mesh({"dp": 2}, {"tp": 4})
        t, e, h, inter, k = 8, 8, 64, 128, 2
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (4 * t, h), jnp.float32)
        w1 = jax.random.normal(ks[1], (e, h, 2 * inter), jnp.float32) * 0.05
        w2 = jax.random.normal(ks[2], (e, inter, h), jnp.float32) * 0.05
        tw, tids = moe.topk_softmax(
            jax.random.normal(ks[3], (4 * t, e)), k, renormalize=True)

        def run(x, w1, w2, tw, tids):
            lw = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
            return ep_lib.ep_fused_experts_a2a(
                x, lw, tw, tids, axis_name="tp", num_experts_global=e,
                block_size=8)

        fn = jax.jit(shard_map(
            run, mesh=mesh,
            in_specs=(P("tp", None), P("tp", None, None), P("tp", None, None),
                      P("tp", None), P("tp", None)),
            out_specs=P("tp", None), check_vma=False,
        ))
        compiled = fn.lower(x, w1, w2, tw, tids).compile()
        assert_no_dcn_collectives(compiled, mesh, n_ici=4)
        inv = collective_inventory(compiled, mesh, n_ici=4)
        assert any(rec["op"] == "all-to-all" for rec in inv), inv

    def test_compress_step_collectives_stay_on_ici(self):
        """Compressed-KV DeepSeek TP decode step on the hybrid mesh: the
        sharded-heads/experts psum points stay inside the ICI block."""
        from sgl_kernel_tpu.models import deepseek
        from sgl_kernel_tpu.parallel import tp as tp_lib

        mesh = make_hybrid_mesh({"dp": 2}, {"tp": 2}, devices=jax.devices()[:4])
        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        page, npages, b = 16, 4, 4
        kv, sc, comp = deepseek.make_compress_caches(
            cfg, npages, page, max_slots=b)
        rope = deepseek.build_rope_cache(cfg)
        decode, _ = tp_lib.make_parallel_deepseek_compress_steps(
            cfg, mesh, params)
        tokens = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray(
            (np.arange(b) % npages).reshape(b, 1), jnp.int32)
        slots = (tables[:, 0] * page).astype(jnp.int32)
        state_slots = jnp.arange(b, dtype=jnp.int32)
        compiled = jax.jit(decode).lower(
            params, kv, sc, comp, tokens, tokens, tables,
            jnp.ones(b, jnp.int32), slots, state_slots, rope,
        ).compile()
        assert_no_dcn_collectives(compiled, mesh, n_ici=2)
        inv = collective_inventory(compiled, mesh, n_ici=2)
        assert inv and all(rec["ici_only"] for rec in inv), inv


@pytest.mark.slow
class TestMultiProcess:
    def test_two_process_decode_matches_oracle(self, tmp_path):
        port = _free_port()
        runner = os.path.join(os.path.dirname(__file__), "multihost_runner.py")
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(runner))] + sys.path
        )
        procs = [
            subprocess.Popen(
                [sys.executable, runner, str(i), "2", str(port), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=420)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"

        # oracle: plain single-device full-batch decode (same cfg/seed as runner)
        cfg = llama.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
            max_position=64, dtype=jnp.float32, fused=False,
        )
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        page, npages, b = 8, 4, 4
        kc, vc = llama.make_caches(cfg, num_pages=npages, page_size=page)
        rope = llama.build_rope_cache(cfg)
        tokens = jnp.asarray(np.arange(b, dtype=np.int32) % cfg.vocab_size)
        positions = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray((np.arange(b) % npages).reshape(b, 1), jnp.int32)
        lengths = jnp.ones(b, jnp.int32)
        slots = (tables[:, 0] * page).astype(jnp.int32)
        ref, _, _ = llama.decode_step(
            params, cfg, kc, vc, tokens, positions, tables, lengths, slots, rope
        )
        ref = np.asarray(ref)

        got = np.concatenate(
            [np.load(tmp_path / f"logits_p{i}.npy") for i in range(2)]
        )
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
