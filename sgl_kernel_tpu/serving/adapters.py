"""Model adapters: the seam between the scheduler (engine.py) and a model
family's jitted step functions.

The reference delegates serving to SGLang, whose ModelRunner binds each
model's forward to the scheduler through a uniform interface
(SURVEY §7). Here the adapter owns everything model-specific — config,
weight init, rope caches, the KV-cache pytree layout, and the three step
programs (prefill, prefill_extend, decode) — while the engine stays a pure
page-table/scheduling loop over opaque ``caches`` pytrees.

All methods take/return the caches pytree so the engine never inspects its
structure (llama: (k_pool, v_pool); deepseek: a single latent pool — or
(latent, idx_k, idx_s) with NSA enabled).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class LlamaAdapter:
    """Llama / Qwen2/3 dense families (models/llama.py); also the base for
    anything exposing the same (k_cache, v_cache) program signatures."""

    name = "llama"
    supports_spec = True
    supports_extend = True  # prefill_extend: prefix reuse + chunked prefill

    def __init__(self, cfg):
        from ..models import llama

        self.cfg = cfg
        self._m = llama
        self.rope_cache = llama.build_rope_cache(cfg)

    def init_weights(self, key):
        return self._m.init_weights(self.cfg, key)

    def make_caches(self, num_pages: int, page_size: int):
        return tuple(self._m.make_caches(self.cfg, num_pages, page_size))

    def prefill(self, params, caches, tokens, positions, q_lens, slot_loc):
        k, v = caches
        logits, k, v = self._m.prefill(
            params, self.cfg, k, v, tokens, positions, q_lens, slot_loc,
            self.rope_cache,
        )
        return logits, (k, v)

    def prefill_extend(self, params, caches, tokens, positions, q_lens,
                       kv_lens, page_tables, slot_loc, *, prefix_max: int):
        k, v = caches
        logits, k, v = self._m.prefill_extend(
            params, self.cfg, k, v, tokens, positions, q_lens, kv_lens,
            page_tables, slot_loc, self.rope_cache, prefix_max=prefix_max,
        )
        return logits, (k, v)

    def decode(self, params, caches, tokens, positions, page_tables,
               lengths, slot_loc):
        k, v = caches
        logits, k, v = self._m.decode_step(
            params, self.cfg, k, v, tokens, positions, page_tables, lengths,
            slot_loc, self.rope_cache,
        )
        return logits, (k, v)

    def prefill_packed(self, params, caches, tokens, positions, blk_seq,
                       blk_q0, seq_meta, last_idx, slot_loc, *, max_kvb: int):
        """Multi-prompt block-aligned packed prefill (one launch for a
        mixed batch — ops/attention/flash_packed.py)."""
        k, v = caches
        logits, k, v = self._m.prefill_packed(
            params, self.cfg, k, v, tokens, positions, blk_seq, blk_q0,
            seq_meta, last_idx, slot_loc, self.rope_cache, max_kvb=max_kvb,
        )
        return logits, (k, v)

    # -- PD disaggregation (serving/pd.py): whole-page KV movement --
    def extract_pages(self, caches, page_ids):
        """Gather whole pages [L, n, H, page, D] (x2) out of the pools."""
        k, v = caches
        ids = jnp.asarray(page_ids, jnp.int32)
        return (k[:, ids], v[:, ids])

    def inject_pages(self, caches, payload, page_ids):
        k, v = caches
        pk, pv = payload
        ids = jnp.asarray(page_ids, jnp.int32)
        return (k.at[:, ids].set(jnp.asarray(pk, k.dtype)),
                v.at[:, ids].set(jnp.asarray(pv, v.dtype)))

    # -- mesh execution (engine mesh=...): jitted shard_map step builders
    # over the caches pytree --
    def make_mesh_steps(self, mesh, params):
        from ..parallel import tp as tp_lib

        dstep = jax.jit(tp_lib.make_parallel_decode_step(self.cfg, mesh, params))
        pfill = jax.jit(tp_lib.make_parallel_prefill(self.cfg, mesh, params))

        def decode(params, caches, *a):
            k, v = caches
            logits, k, v = dstep(params, k, v, *a, self.rope_cache)
            return logits, (k, v)

        def prefill(params, caches, *a):
            k, v = caches
            logits, k, v = pfill(params, k, v, *a, self.rope_cache)
            return logits, (k, v)

        return decode, prefill


class MixtralAdapter(LlamaAdapter):
    """Mixtral-style routed-MoE Llama (models/mixtral.py): identical
    program signatures over (k, v) pools, MoE MLP inside. Extend-prefill
    exists (mixtral.prefill_extend) so prefix reuse + chunked prompts
    work; no packed / spec programs yet."""

    name = "mixtral"
    supports_spec = True  # MoE target + llama-family draft (models/spec.py)
    supports_extend = True

    def __init__(self, cfg):
        from ..models import llama, mixtral

        self.cfg = cfg
        self._m = mixtral
        self.rope_cache = llama.build_rope_cache(cfg)

    def make_caches(self, num_pages: int, page_size: int):
        from ..models import llama

        return tuple(llama.make_caches(self.cfg, num_pages, page_size))

    make_mesh_steps = None  # no family-specific shard_map step yet


class GptOssAdapter(MixtralAdapter):
    """gpt-oss (models/gptoss.py): attention sinks + alternating sliding
    window + clamped-swiglu MoE, same serving signatures as mixtral.
    Extend runs both passes sink-free and renormalizes once after the
    merge (apply_sinks), preserving the single-kernel sink semantics."""

    name = "gptoss"

    def __init__(self, cfg):
        from ..models import gptoss, llama

        self.cfg = cfg
        self._m = gptoss
        self.rope_cache = llama.build_rope_cache(cfg)


class HybridGdnAdapter(LlamaAdapter):
    """Hybrid GDN / Qwen3-Next-style (models/hybrid_gdn.py): alternating
    Gated-DeltaNet and paged-GQA layers. GDN layers carry per-sequence
    recurrent state (conv window + SSM state); the adapter owns
    slot-major state pools and gathers/scatters rows by the engine's
    per-request state slots (ops/linear_attn/state_cache layout)."""

    name = "hybrid_gdn"
    supports_spec = False
    supports_extend = True   # chunked prompts: conv+SSM state carries across chunks
    supports_prefix_reuse = False  # recurrent state is NOT prefix-shareable
    needs_state_slots = True

    def __init__(self, cfg):
        from ..models import hybrid_gdn

        self.cfg = cfg
        self._m = hybrid_gdn
        self.rope_cache = hybrid_gdn.build_rope_cache(cfg)

    def make_caches(self, num_pages: int, page_size: int, max_slots: int = 16):
        k, v = self._m.make_caches(self.cfg, num_pages, page_size)
        conv, ssm = self._m.make_states(self.cfg, max_slots)
        return (k, v, conv, ssm)

    def prefill(self, params, caches, tokens, positions, q_lens, slot_loc,
                state_slots=None):
        k, v, conv, ssm = caches
        rows = jnp.asarray(state_slots, jnp.int32)
        # prefill is always sequence START for this family (no extend):
        # begin from ZERO state — recycled slots hold the previous
        # request's recurrent state
        zc = jnp.zeros_like(conv[:, rows])
        zs = jnp.zeros_like(ssm[:, rows])
        logits, k, v, cs, ss = self._m.prefill(
            params, self.cfg, k, v, zc, zs,
            tokens, positions, q_lens, slot_loc, self.rope_cache,
        )
        return logits, (k, v, conv.at[:, rows].set(cs), ssm.at[:, rows].set(ss))

    def prefill_extend(self, params, caches, tokens, positions, q_lens,
                       kv_lens, page_tables, slot_loc, *, prefix_max: int,
                       state_slots=None):
        """Chunk continuation: the GDN recurrence resumes from the state
        the previous chunk left in this request's slot (reference one-call
        prefill/decode/spec batching, gdn_attn_interface_impl.hpp:382-475).
        Only valid for SAME-REQUEST chunking — supports_prefix_reuse=False
        keeps the radix cache away from this family."""
        k, v, conv, ssm = caches
        rows = jnp.asarray(state_slots, jnp.int32)
        logits, k, v, cs, ss = self._m.prefill_extend(
            params, self.cfg, k, v, conv[:, rows], ssm[:, rows],
            tokens, positions, q_lens, kv_lens, page_tables, slot_loc,
            self.rope_cache, prefix_max=prefix_max,
        )
        return logits, (k, v, conv.at[:, rows].set(cs), ssm.at[:, rows].set(ss))

    prefill_packed = None
    make_mesh_steps = None

    def decode(self, params, caches, tokens, positions, page_tables,
               lengths, slot_loc, state_slots=None):
        k, v, conv, ssm = caches
        rows = jnp.asarray(state_slots, jnp.int32)
        logits, k, v, cs, ss = self._m.decode_step(
            params, self.cfg, k, v, conv[:, rows], ssm[:, rows],
            tokens, positions, page_tables, lengths, slot_loc, self.rope_cache,
        )
        return logits, (k, v, conv.at[:, rows].set(cs), ssm.at[:, rows].set(ss))

    # -- PD disaggregation: pages (attention layers) + recurrent state --
    def extract_pages(self, caches, page_ids):
        k, v = caches[0], caches[1]
        ids = jnp.asarray(page_ids, jnp.int32)
        return (k[:, ids], v[:, ids])

    def inject_pages(self, caches, payload, page_ids):
        k, v, conv, ssm = caches
        pk, pv = payload
        ids = jnp.asarray(page_ids, jnp.int32)
        return (k.at[:, ids].set(jnp.asarray(pk, k.dtype)),
                v.at[:, ids].set(jnp.asarray(pv, v.dtype)), conv, ssm)

    def extract_state(self, caches, state_slot: int):
        _, _, conv, ssm = caches
        return (conv[:, state_slot], ssm[:, state_slot])

    def inject_state(self, caches, payload, state_slot: int):
        k, v, conv, ssm = caches
        cs, ss = payload
        return (k, v,
                conv.at[:, state_slot].set(jnp.asarray(cs, conv.dtype)),
                ssm.at[:, state_slot].set(jnp.asarray(ss, ssm.dtype)))


class DeepseekAdapter:
    """DeepSeek-V3/V4 MLA families (models/deepseek.py): single latent pool
    [L, P, page, 576]; optional DSv4 NSA sparse decode (per-layer fp8
    indexer caches + fast_topk + sparse MLA gather) via ``use_nsa``.

    MLA pools want BIG pages: the decode pipeline is per-step-overhead-
    bound, and page=1024 streams 602-647 GB/s vs 206-262 at page=128
    (docs/PERF.md round 4; an MLA page=1024 is ~1.15 MB — the same byte
    class as a GQA [Hkv=8, 128, 128] page block). ``recommended_page_size``
    reports it; Engine callers pass it as page_size."""

    name = "deepseek"
    recommended_page_size = 1024
    supports_spec = True  # chain spec via prefill_extend(num_logits) —
    # latent-pool target caches splat through spec_decode_round; a
    # llama-family draft proposes (models/spec.py)
    supports_extend = True

    def __init__(self, cfg, *, use_nsa: bool = False, use_compress: bool = False):
        from ..models import deepseek

        self.cfg = cfg
        self._m = deepseek
        self.use_nsa = use_nsa
        self.use_compress = use_compress
        if use_nsa or use_compress:
            # NSA / compressed caches have extra pools with different
            # extend signatures — no spec program for those modes
            self.supports_spec = False
        if use_compress:
            assert not use_nsa, "compress and NSA decode are exclusive modes"
            assert cfg.compress in ("c4", "c128"), cfg.compress
            # compressed rings are per-request recurrent state (the GDN
            # slot machinery); no extend program (ring is not
            # prefix-shareable)
            self.needs_state_slots = True
            self.supports_extend = False
        self.rope_cache = deepseek.build_rope_cache(cfg)
        self.idx_rope_cache = deepseek.build_idx_rope_cache(cfg) if use_nsa else None

    def init_weights(self, key):
        return self._m.init_weights(self.cfg, key)

    def make_caches(self, num_pages: int, page_size: int, max_slots: int = 16):
        if self.use_compress:
            return self._m.make_compress_caches(self.cfg, num_pages, page_size, max_slots)
        kv = self._m.make_cache(self.cfg, num_pages, page_size)
        if not self.use_nsa:
            return (kv,)
        idx_k, idx_s = self._m.make_indexer_cache(self.cfg, num_pages, page_size)
        return (kv, idx_k, idx_s)

    def prefill(self, params, caches, tokens, positions, q_lens, slot_loc,
                state_slots=None):
        if self.use_compress:
            kv, sc, comp = caches
            logits, kv, sc, comp = self._m.prefill_c(
                params, self.cfg, kv, sc, comp, tokens, positions, q_lens,
                slot_loc, jnp.asarray(state_slots, jnp.int32), self.rope_cache,
            )
            return logits, (kv, sc, comp)
        if self.use_nsa:
            kv, idx_k, idx_s = caches
            logits, kv, idx_k, idx_s = self._m.prefill_nsa(
                params, self.cfg, kv, idx_k, idx_s, tokens, positions,
                q_lens, slot_loc, self.rope_cache, self.idx_rope_cache,
            )
            return logits, (kv, idx_k, idx_s)
        (kv,) = caches
        logits, kv = self._m.prefill(
            params, self.cfg, kv, tokens, positions, q_lens, slot_loc,
            self.rope_cache,
        )
        return logits, (kv,)

    def prefill_extend(self, params, caches, tokens, positions, q_lens,
                       kv_lens, page_tables, slot_loc, *, prefix_max: int):
        if self.use_nsa:
            kv, idx_k, idx_s = caches
            logits, kv, idx_k, idx_s = self._m.prefill_extend_nsa(
                params, self.cfg, kv, idx_k, idx_s, tokens, positions,
                q_lens, kv_lens, page_tables, slot_loc, self.rope_cache,
                self.idx_rope_cache, prefix_max=prefix_max,
            )
            return logits, (kv, idx_k, idx_s)
        (kv,) = caches
        logits, kv = self._m.prefill_extend(
            params, self.cfg, kv, tokens, positions, q_lens, kv_lens,
            page_tables, slot_loc, self.rope_cache, prefix_max=prefix_max,
        )
        return logits, (kv,)

    def decode(self, params, caches, tokens, positions, page_tables,
               lengths, slot_loc, state_slots=None):
        if self.use_compress:
            kv, sc, comp = caches
            logits, kv, sc, comp = self._m.decode_step_c(
                params, self.cfg, kv, sc, comp, tokens, positions,
                page_tables, lengths, slot_loc,
                jnp.asarray(state_slots, jnp.int32), self.rope_cache,
            )
            return logits, (kv, sc, comp)
        if self.use_nsa:
            kv, idx_k, idx_s = caches
            logits, kv, idx_k, idx_s = self._m.decode_step_nsa(
                params, self.cfg, kv, idx_k, idx_s, tokens, positions,
                page_tables, lengths, slot_loc, self.rope_cache,
                self.idx_rope_cache,
            )
            return logits, (kv, idx_k, idx_s)
        (kv,) = caches
        logits, kv = self._m.decode_step(
            params, self.cfg, kv, tokens, positions, page_tables, lengths,
            slot_loc, self.rope_cache,
        )
        return logits, (kv,)

    def prefill_packed(self, params, caches, tokens, positions, blk_seq,
                       blk_q0, seq_meta, last_idx, slot_loc, *, max_kvb: int,
                       state_slots=None):
        """Multi-prompt block-aligned packed MLA prefill (with NSA indexer
        ingest when use_nsa; score stores + ring build when use_compress)."""
        if self.use_compress:
            kv, sc, comp = caches
            logits, kv, sc, comp = self._m.prefill_packed_c(
                params, self.cfg, kv, sc, comp, tokens, positions, blk_seq,
                blk_q0, seq_meta, last_idx, slot_loc,
                jnp.asarray(state_slots, jnp.int32), self.rope_cache,
                max_kvb=max_kvb,
            )
            return logits, (kv, sc, comp)
        if self.use_nsa:
            kv, idx_k, idx_s = caches
            logits, kv, idx_k, idx_s = self._m.prefill_packed(
                params, self.cfg, kv, idx_k, idx_s, tokens, positions,
                blk_seq, blk_q0, seq_meta, last_idx, slot_loc,
                self.rope_cache, max_kvb=max_kvb, with_indexer=True,
                idx_rope_cache=self.idx_rope_cache,
            )
            return logits, (kv, idx_k, idx_s)
        (kv,) = caches
        logits, kv = self._m.prefill_packed(
            params, self.cfg, kv, None, None, tokens, positions, blk_seq,
            blk_q0, seq_meta, last_idx, slot_loc, self.rope_cache,
            max_kvb=max_kvb,
        )
        return logits, (kv,)

    def make_mesh_steps(self, mesh, params):
        from ..parallel import tp as tp_lib

        if self.use_compress:
            dstep, pfill = tp_lib.make_parallel_deepseek_compress_steps(
                self.cfg, mesh, params)
            dstep, pfill = jax.jit(dstep), jax.jit(pfill)

            def decode(params, caches, *a, state_slots=None):
                kv, sc, comp = caches
                logits, kv, sc, comp = dstep(
                    params, kv, sc, comp, *a,
                    jnp.asarray(state_slots, jnp.int32), self.rope_cache)
                return logits, (kv, sc, comp)

            def prefill(params, caches, *a, state_slots=None):
                kv, sc, comp = caches
                logits, kv, sc, comp = pfill(
                    params, kv, sc, comp, *a,
                    jnp.asarray(state_slots, jnp.int32), self.rope_cache)
                return logits, (kv, sc, comp)

            return decode, prefill

        if self.use_nsa:
            dstep, pfill = tp_lib.make_parallel_deepseek_nsa_steps(
                self.cfg, mesh, params, self.idx_rope_cache)
            dstep, pfill = jax.jit(dstep), jax.jit(pfill)

            def decode(params, caches, *a):
                kv, ik, isc = caches
                logits, kv, ik, isc = dstep(params, kv, ik, isc, *a,
                                            self.rope_cache, self.idx_rope_cache)
                return logits, (kv, ik, isc)

            def prefill(params, caches, *a):
                kv, ik, isc = caches
                logits, kv, ik, isc = pfill(params, kv, ik, isc, *a,
                                            self.rope_cache, self.idx_rope_cache)
                return logits, (kv, ik, isc)

            return decode, prefill

        dstep = jax.jit(tp_lib.make_parallel_deepseek_decode_step(self.cfg, mesh, params))
        pfill = jax.jit(tp_lib.make_parallel_deepseek_prefill(self.cfg, mesh, params))

        def decode(params, caches, *a):
            (kv,) = caches
            logits, kv = dstep(params, kv, *a, self.rope_cache)
            return logits, (kv,)

        def prefill(params, caches, *a):
            (kv,) = caches
            logits, kv = pfill(params, kv, *a, self.rope_cache)
            return logits, (kv,)

        return decode, prefill

    # -- compressed rings are per-request recurrent state (PD movement) --
    def extract_state(self, caches, state_slot: int):
        assert self.use_compress
        return (caches[2][:, state_slot],)  # [L, ring, 576]

    def inject_state(self, caches, payload, state_slot: int):
        assert self.use_compress
        kv, sc, comp = caches
        (rows,) = payload
        return (kv, sc, comp.at[:, state_slot].set(jnp.asarray(rows, comp.dtype)))

    # -- PD disaggregation: whole-page latent (+ score / indexer) movement --
    def extract_pages(self, caches, page_ids):
        ids = jnp.asarray(page_ids, jnp.int32)
        kv = caches[0]
        if self.use_compress:
            return (kv[:, ids], caches[1][:, ids])
        out = (kv[:, ids],)  # [L, n, page, 576]
        if self.use_nsa:
            _, p, pg, _ = kv.shape
            idx_k, idx_s = caches[1], caches[2]
            ik = idx_k.reshape(-1, p, pg, idx_k.shape[-1])[:, ids]
            isc = idx_s.reshape(-1, p, pg)[:, ids]
            out = out + (ik, isc)
        return out

    def inject_pages(self, caches, payload, page_ids):
        ids = jnp.asarray(page_ids, jnp.int32)
        kv = caches[0].at[:, ids].set(jnp.asarray(payload[0], caches[0].dtype))
        if self.use_compress:
            sc = caches[1].at[:, ids].set(jnp.asarray(payload[1], caches[1].dtype))
            return (kv, sc, caches[2])
        if not self.use_nsa:
            return (kv,)
        _, p, pg, _ = kv.shape
        idx_k, idx_s = caches[1], caches[2]
        ik4 = idx_k.reshape(-1, p, pg, idx_k.shape[-1])
        isc3 = idx_s.reshape(-1, p, pg)
        ik4 = ik4.at[:, ids].set(jnp.asarray(payload[1], idx_k.dtype))
        isc3 = isc3.at[:, ids].set(jnp.asarray(payload[2], idx_s.dtype))
        return (kv, ik4.reshape(idx_k.shape), isc3.reshape(idx_s.shape))


def adapter_for(cfg):
    """Pick an adapter from the config's type (most-specific first —
    MixtralConfig/GptOssConfig SUBCLASS LlamaConfig)."""
    from ..models import deepseek, gptoss, llama, mixtral

    if isinstance(cfg, deepseek.DeepseekConfig):
        # auto-select the decode mode the config promises (an explicit
        # adapter= can still override); compress+nsa trips the
        # exclusivity assert instead of silently picking one
        return DeepseekAdapter(
            cfg,
            use_nsa=bool(getattr(cfg, "nsa", False)),
            use_compress=bool(getattr(cfg, "compress", None)),
        )
    if isinstance(cfg, gptoss.GptOssConfig):
        return GptOssAdapter(cfg)
    from ..models import hybrid_gdn

    if isinstance(cfg, hybrid_gdn.HybridGdnConfig):
        return HybridGdnAdapter(cfg)
    if isinstance(cfg, mixtral.MixtralConfig):
        return MixtralAdapter(cfg)
    if isinstance(cfg, llama.LlamaConfig):
        return LlamaAdapter(cfg)
    raise TypeError(f"no serving adapter for config type {type(cfg).__name__}")
