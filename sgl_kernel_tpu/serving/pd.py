"""Prefill/decode disaggregation (PD).

The reference's deployment story separates prefill and decode instances
and moves KV through the HiCache transfer kernels
(src/sycl/KVCacheIO.cpp lf/pf/ph layouts; SGLang's disaggregation mode).
TPU-native form: the prefill Engine computes a prompt's KV into its own
paged pool, the request's WHOLE PAGES are extracted (adapter
extract_pages — one gather on the [L, P, ...] pool), shipped over the
chosen transport, injected into the decode Engine's pool (inject_pages),
and the request continues as a decode-only citizen
(Engine.add_prefilled_request) — the decode instance never runs prefill.

Transports:
  device  payloads stay jax arrays (same process / same platform; over a
          real multi-chip deployment this is jax.device_put across meshes
          riding ICI/DCN)
  host    payloads round-trip through numpy (the cross-process form —
          exact bit preservation is covered by the kvcacheio layout
          matrix tests)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..utils import cdiv
from .engine import Engine


def extract_request_payload(engine: Engine, rid: int, *, transport: str = "device"):
    """Pull a prefilled request's prompt KV pages out of the prefill
    engine. The request must still be RUNNING (its pages are released at
    retirement) and must have sampled >= 1 token (the PD handoff token)."""
    req = next(r for r in engine.running if r.rid == rid)
    assert req.output, "prefill instance must sample the handoff token"
    assert req.pages, "pages already released — extract before retirement"
    n_pages = cdiv(len(req.prompt), engine.page_size)
    page_ids = req.pages[:n_pages]
    payload = engine.adapter.extract_pages(engine.caches, page_ids)
    state_payload = None
    if getattr(engine, "_stateful", False):
        state_payload = engine.adapter.extract_state(engine.caches, req.state_slot)
    if transport == "host":
        payload = jax.tree.map(np.asarray, payload)
        if state_payload is not None:
            state_payload = jax.tree.map(np.asarray, state_payload)
    return payload, req.output[0], state_payload


class PDOrchestrator:
    """One prefill Engine + one decode Engine over separate pools.

    Drives the full disaggregated flow for each submitted request:
      1. prefill engine: add_request(max_new_tokens=1) -> prompt KV + the
         first sampled token,
      2. extract_pages -> transport -> inject_pages,
      3. decode engine: add_prefilled_request continues generation.
    """

    def __init__(self, cfg, params=None, *, num_pages_prefill: int = 128,
                 num_pages_decode: int = 128, page_size: int = 64,
                 transport: str = "host", adapter=None, decode_adapter=None,
                 **engine_kw):
        if params is None:
            from .adapters import adapter_for

            if adapter is None:
                adapter = adapter_for(cfg)  # reused by the prefill engine
            params = adapter.init_weights(jax.random.PRNGKey(engine_kw.get("seed", 0)))
        self.transport = transport
        self.prefill_eng = Engine(
            cfg, params, num_pages=num_pages_prefill, page_size=page_size,
            adapter=adapter, enable_prefix_cache=False, **engine_kw,
        )
        self.decode_eng = Engine(
            cfg, params, num_pages=num_pages_decode, page_size=page_size,
            adapter=decode_adapter if decode_adapter is not None else adapter,
            enable_prefix_cache=False, **engine_kw,
        )

    def submit(self, prompt: List[int], max_new_tokens: int = 32, **sampling) -> Optional[int]:
        """Run the PD handoff for one prompt; returns the decode-side rid."""
        eng = self.prefill_eng
        p_rid = eng.add_request(list(prompt), max_new_tokens=1, **sampling)
        # advance the prefill scheduler WITHOUT retiring (retirement frees
        # the pages): admit + chunked-prefill progress until the request
        # lands in running with its handoff token sampled
        for _ in range(10_000):
            if any(r.rid == p_rid for r in eng.running):
                break
            was_waiting = len(eng.waiting)
            eng._admit()
            eng._advance_prefilling()
            if (len(eng.waiting) == was_waiting and not eng.prefilling
                    and not any(r.rid == p_rid for r in eng.running)):
                # admission blocked: DROP the request — leaving it queued
                # would head-of-line-block every later submit and prefill
                # at full cost with nobody extracting the payload
                eng.waiting = [r for r in eng.waiting if r.rid != p_rid]
                return None
        payload, first, state_payload = extract_request_payload(
            eng, p_rid, transport=self.transport)
        eng.step()  # retire the prefill-side request, release its pages
        return self.decode_eng.add_prefilled_request(
            list(prompt), first, payload, max_new_tokens=max_new_tokens,
            state_payload=state_payload, **sampling
        )

    def run_until_done(self, max_steps: int = 10_000):
        return self.decode_eng.run_until_done(max_steps)

    def output(self, rid: int) -> List[int]:
        return self.decode_eng.finished[rid].output
