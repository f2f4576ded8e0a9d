"""Continuous-batching serving engine.

The thin serving loop the north star requires (the reference delegates this
to SGLang; SURVEY §7 makes it part of this framework): a paged-KV page
allocator (free list), a prefill/decode scheduler, and a step loop that
feeds the jitted model functions. Host-side logic is deliberately tiny —
all compute is inside the jitted prefill/decode_step programs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..ops.sampling import sample_tokens
from .adapters import adapter_for
from ..utils import cdiv
from ..utils.metrics import Metrics, logger


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new_tokens: int = 32
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    stop_tokens: tuple = ()
    output: List[int] = dataclasses.field(default_factory=list)
    pages: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    prefix_len: int = 0          # tokens reused from the radix cache
    shared_pages: int = 0        # leading cache-owned pages in ``pages``
    lock_id: int = 0             # radix-cache pin handle (0 = none)
    prefill_pos: int = 0         # chunked-prefill progress (tokens stored)
    # grammar-constrained decoding (ops/grammar.py): either a fixed
    # [ceil(V/32)] int32 bitmask, or a callable prev_tokens -> bitmask for
    # stateful grammars (the XGrammar automaton lives host-side, as in the
    # reference's SGLang integration)
    grammar: object = None
    state_slot: int = -1         # recurrent-state pool row (stateful families)

    @property
    def seq_len(self) -> int:
        return len(self.prompt) + len(self.output)


class PageAllocator:
    """Free-list page allocator over the paged KV pool (page 0 reserved as
    the pad page, mirroring the decode kernel's padding convention)."""

    def __init__(self, num_pages: int):
        self.free = list(range(num_pages - 1, 0, -1))

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: List[int]):
        self.free.extend(pages)


class Engine:
    """Continuous batching over a single chip (multi-chip via parallel/).

    Model-family agnostic through serving/adapters.py: pass a Llama/Qwen
    or DeepSeek config (auto-adapter) or an explicit ``adapter`` (e.g.
    ``DeepseekAdapter(cfg, use_nsa=True)`` for DSv4 sparse decode).
    """

    def __init__(
        self,
        cfg,
        params=None,
        *,
        max_batch: int = 8,
        num_pages: int = 512,
        page_size: int = 64,
        max_pages_per_seq: Optional[int] = None,
        prefill_bucket: int = 128,
        seed: int = 0,
        enable_prefix_cache: bool = True,
        draft_cfg: Optional[llama.LlamaConfig] = None,
        draft_params=None,
        spec_gamma: int = 4,
        spec_topk: int = 1,
        mesh=None,
        prefill_chunk: Optional[int] = None,
        log_every: int = 0,
        adapter=None,
        decode_burst: int = 1,
        enable_mixed: bool = True,
    ):
        self.adapter = adapter if adapter is not None else adapter_for(cfg)
        self.cfg = cfg
        self.page_size = page_size
        self.max_batch = max_batch
        self.max_pages_per_seq = max_pages_per_seq or cdiv(cfg.max_position, page_size)
        self.prefill_bucket = prefill_bucket
        # chunked prefill (the reference's chunkprefill two-launch design,
        # flash_attention.cpp:1207-1325, lifted to the scheduler): prompts
        # longer than prefill_chunk are ingested in chunks through the
        # extend path, bounding per-step activation memory
        self.prefill_chunk = prefill_chunk
        self.enable_mixed = enable_mixed
        if params is None:
            params = self.adapter.init_weights(jax.random.PRNGKey(seed))
        self.params = params
        self.rope_cache = self.adapter.rope_cache
        # stateful families (hybrid GDN): per-request recurrent-state rows,
        # slot max_batch reserved as the padded-row scratch slot
        self._stateful = getattr(self.adapter, "needs_state_slots", False)
        if self._stateful:
            self.caches = self.adapter.make_caches(
                num_pages, page_size, max_slots=max_batch + 1)
            self._free_state_slots = list(range(max_batch - 1, -1, -1))
        else:
            self.caches = self.adapter.make_caches(num_pages, page_size)
        # multi-chip execution: a ("dp", "tp") mesh turns the decode/prefill
        # steps into shard_map programs (parallel/tp.py). dp must be 1 with
        # this engine's single global page pool; tp shards heads + ffn.
        self.mesh = mesh
        self._pstep = self._pprefill = None
        if mesh is not None:
            builder = getattr(self.adapter, "make_mesh_steps", None)
            assert builder is not None, f"no mesh TP path for {self.adapter.name} (parallel/tp.py)"
            assert mesh.shape.get("dp", 1) == 1, "dp>1 needs per-shard page pools"
            self._pstep, self._pprefill = builder(mesh, params)
        # families without an extend-prefill program can't consume cached
        # prefixes or chunk prompts — auto-disable instead of failing later
        if not getattr(self.adapter, "supports_extend", True):
            enable_prefix_cache = False
            assert prefill_chunk is None, (
                f"{self.adapter.name} has no extend program; prefill_chunk "
                "requires chunked (extend) prefill")
        # stateful-recurrent families (hybrid GDN) chunk their OWN prompts
        # but can't adopt another request's prefix — the conv/SSM state
        # behind a radix-cache hit doesn't exist
        if not getattr(self.adapter, "supports_prefix_reuse",
                       getattr(self.adapter, "supports_extend", True)):
            enable_prefix_cache = False
        self.native = None
        if enable_prefix_cache:
            try:
                from .native import NativeAllocator

                self.native = NativeAllocator(num_pages, page_size)
            except Exception:
                self.native = None
        self.allocator = self.native if self.native is not None else PageAllocator(num_pages)
        # chain speculative decoding (models/spec.py): a draft model
        # proposes spec_gamma tokens per round, the target verifies them in
        # one multi-token forward; greedy requests then emit several tokens
        # per scheduler step with unchanged output (lossless)
        self.draft_cfg = draft_cfg
        self.spec_gamma = spec_gamma
        # spec_topk > 1 switches to TREE speculation (spec_tree_round):
        # each draft step's top-k tokens become sibling nodes; needs the
        # target family's tree-masked verify program (llama.prefill_tree)
        self.spec_topk = spec_topk
        if draft_cfg is not None:
            assert self.adapter.supports_spec, f"{self.adapter.name} has no spec-decode program (models/spec.py)"
            if spec_topk > 1:
                assert getattr(self.adapter._m, "prefill_tree", None) is not None, (
                    f"{self.adapter.name} has no tree-masked verify program "
                    "(prefill_tree); use spec_topk=1 chain speculation")
            self.draft_params = draft_params if draft_params is not None else llama.init_weights(
                draft_cfg, jax.random.PRNGKey(seed + 1)
            )
            self.draft_rope = llama.build_rope_cache(draft_cfg)
            self.dk_cache, self.dv_cache = llama.make_caches(draft_cfg, num_pages, page_size)
        self.waiting: List[Request] = []
        self.prefilling: List[Request] = []  # chunked-prefill in flight
        self.running: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self._next_rid = 0
        self._key = jax.random.PRNGKey(seed)
        # host-overlap decode: with decode_burst > 1, all-greedy decode
        # batches run `burst` autoregressive steps in ONE jitted program
        # (argmax fed back on device), amortizing the per-step host
        # round-trip (~ms through the axon relay) over `burst` tokens.
        # Tokens past a stop condition are computed-then-discarded; their
        # KV lands in the request's own not-yet-used slots, which retire
        # with the request (prefix-cache insertion stops at the truncated
        # length).
        self.decode_burst = decode_burst
        self._burst_fns = {}
        # runtime counters (SURVEY §5 observability; utils/metrics.py)
        self.metrics = Metrics()
        self.log_every = log_every

    # ------------------------------------------------------------------
    def add_request(
        self,
        prompt: List[int],
        max_new_tokens: int = 32,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        min_p: Optional[float] = None,
        stop_tokens=(),
        grammar=None,
    ) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.waiting.append(Request(
            rid, list(prompt), max_new_tokens, temperature,
            top_k=top_k, top_p=top_p, min_p=min_p, stop_tokens=tuple(stop_tokens),
            grammar=grammar,
        ))
        return rid

    def add_prefilled_request(
        self,
        prompt: List[int],
        first_token: int,
        payload,
        max_new_tokens: int = 32,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        min_p: Optional[float] = None,
        stop_tokens=(),
        state_payload=None,
    ) -> Optional[int]:
        """PD disaggregation (serving/pd.py): adopt a request whose prompt
        KV was computed on a prefill instance. ``payload`` is the
        adapter's extract_pages output covering ceil(len(prompt)/page)
        whole pages; ``first_token`` is the prefill instance's sampled
        token (its KV slot is still unwritten, decode writes it).
        Skips the prefill path entirely. Returns rid, or None when pages
        can't be allocated."""
        assert not self._stateful or state_payload is not None, (
            "stateful family: pass state_payload (adapter.extract_state)")
        assert self.draft_cfg is None, (
            "PD adoption into a draft-spec decode engine is not supported: "
            "the draft KV cache was never prefilled with the prompt and the "
            "page reservation lacks spec_gamma slack")
        if len(self.running) + len(self.prefilling) >= self.max_batch:
            # the decode batch is padded to max_batch; over-admitting would
            # overflow it. Callers retry after a step() retires something.
            self.metrics.inc("admission_blocked")
            return None
        n_payload = cdiv(len(prompt), self.page_size)
        need = cdiv(len(prompt) + max_new_tokens, self.page_size)
        pages = self.allocator.alloc(need)
        if pages is None and self.native is not None:
            self.metrics.inc("pages_evicted", self.native.evict(need - self.allocator.free))
            pages = self.allocator.alloc(need)
        if pages is None:
            self.metrics.inc("admission_blocked")
            return None
        self.caches = self.adapter.inject_pages(self.caches, payload, pages[:n_payload])
        state_slot = -1
        if self._stateful:
            if not self._free_state_slots:
                self.allocator.release(pages)
                self.metrics.inc("admission_blocked")
                return None
            state_slot = self._free_state_slots.pop()
            self.caches = self.adapter.inject_state(self.caches, state_payload, state_slot)
        rid = self._next_rid
        self._next_rid += 1
        req = Request(
            rid, list(prompt), max_new_tokens, temperature,
            top_k=top_k, top_p=top_p, min_p=min_p, stop_tokens=tuple(stop_tokens),
        )
        req.pages = pages
        req.state_slot = state_slot
        req.output = [int(first_token)]
        if req.max_new_tokens <= 1 or int(first_token) in req.stop_tokens:
            req.done = True
        self.running.append(req)
        self.metrics.inc("requests_adopted")
        return rid

    def _slot(self, req: Request, pos: int) -> int:
        return req.pages[pos // self.page_size] * self.page_size + pos % self.page_size

    def _page_table(self, req: Request) -> np.ndarray:
        pt = np.zeros(self.max_pages_per_seq, np.int32)
        pt[: len(req.pages)] = req.pages
        return pt

    def _batch_tables(self, reqs, bp: int) -> np.ndarray:
        """Batched page-table assembly; the C++ binding when available
        (native.assemble_tables — one call instead of per-request numpy
        copies on the decode hot path)."""
        if self.native is not None:
            lists = [r.pages for r in reqs] + [[]] * (bp - len(reqs))
            return self.native.assemble_tables(lists, self.max_pages_per_seq)
        t = np.zeros((bp, self.max_pages_per_seq), np.int32)
        for i, r in enumerate(reqs):
            t[i, : len(r.pages)] = r.pages
        return t

    # ------------------------------------------------------------------
    def _admit(self):
        batch: List[Request] = []  # fresh full prefills -> one packed launch
        while (self.waiting
               and len(self.running) + len(self.prefilling) + len(batch) < self.max_batch):
            req = self.waiting[0]
            shared: List[int] = []
            if self.native is not None and len(req.prompt) > 1:
                # reuse the longest cached page-aligned prefix, keeping at
                # least one fresh token so prefill produces logits
                probe = req.prompt[: len(req.prompt) - 1]
                matched, shared, req.lock_id = self.native.match_prefix_locked(probe)
                req.prefix_len = matched
                req.shared_pages = len(shared)
            # tree spec writes dt-1 = gamma*topk per-node rows past the root
            slack = (self.spec_gamma * self.spec_topk
                     if self.draft_cfg is not None else 0)
            need = cdiv(req.seq_len + req.max_new_tokens + slack, self.page_size) - len(shared)
            pages = self.allocator.alloc(need)
            if pages is None and self.native is not None:
                # LRU-evict unpinned cached pages back to the free list (the
                # reference radix cache's evict-on-pressure behavior) and retry
                # — without this, retired requests' pages adopted by the cache
                # starve new admissions forever.
                self.metrics.inc("pages_evicted", self.native.evict(need - self.allocator.free))
                pages = self.allocator.alloc(need)
            if pages is None:
                if req.lock_id:
                    self.native.unlock(req.lock_id)
                    req.prefix_len = req.shared_pages = req.lock_id = 0
                self.metrics.inc("admission_blocked")
                break
            req.pages = shared + pages
            if self._stateful:
                req.state_slot = self._free_state_slots.pop()
            self.waiting.pop(0)
            self.metrics.inc("requests_admitted")
            self.metrics.inc("prefix_cache_hit_tokens", req.prefix_len)
            if (self.prefill_chunk is not None
                    and len(req.prompt) - req.prefix_len > self.prefill_chunk):
                # long prompt: ingest chunk-by-chunk across scheduler steps
                # so running decodes aren't stalled behind the whole prefill
                # (the reference's chunkprefill mixed-batch fairness,
                # flash_attention.cpp:1207-1325, lifted to the scheduler)
                req.prefill_pos = req.prefix_len
                self.prefilling.append(req)
            elif (req.prefix_len == 0
                    and self._pprefill is None  # mesh TP prefill stays padded
                    and getattr(self.adapter, "prefill_packed", None) is not None):
                batch.append(req)  # packed multi-prompt launch below
            else:
                with self.metrics.time("prefill"):
                    self._prefill(req)
                self.metrics.inc("tokens_prefilled", len(req.prompt) - req.prefix_len)
                self.running.append(req)
        if batch:
            with self.metrics.time("prefill"):
                self._prefill_packed_batch(batch)
            self.metrics.inc("tokens_prefilled", sum(len(r.prompt) for r in batch))
            self.running.extend(batch)

    _PACK_BLOCK = 256  # flash_packed block / sequence alignment

    def _prefill_packed_batch(self, reqs: List[Request]):
        """Fresh prompts block-aligned packed into ONE model launch
        (models/*.prefill_packed): per-sequence padding < block instead of
        bucket - len, and no per-request launch overhead. Shapes bucket to
        power-of-two block counts to bound recompiles."""
        if len(reqs) == 1:
            self._prefill(reqs[0])
            return
        block = self._PACK_BLOCK
        lens = [len(r.prompt) for r in reqs]
        nqb = [max(cdiv(l, block), 1) for l in lens]
        nb = 1 << (sum(nqb) - 1).bit_length()  # padded block count
        tp = nb * block
        bp = self.max_batch + 1  # +1 row for the padding pseudo-sequence
        tokens = np.zeros(tp, np.int32)
        positions = np.zeros(tp, np.int32)
        slot_loc = np.full(tp, -1, np.int32)
        blk_seq = np.full(nb, len(reqs), np.int32)  # padding blocks -> empty seq
        blk_q0 = np.zeros(nb, np.int32)
        seq_meta = np.zeros((bp, 6), np.int32)
        seq_meta[:, 5] = 1  # kv_blks >= 1 keeps index-map clamps in range
        last_idx = np.zeros(bp, np.int32)
        t0 = b0 = 0
        for i, r in enumerate(reqs):
            l = lens[i]
            tokens[t0 : t0 + l] = r.prompt
            positions[t0 : t0 + l] = np.arange(l)
            slot_loc[t0 : t0 + l] = [self._slot(r, p) for p in range(l)]
            blk_seq[b0 : b0 + nqb[i]] = i
            blk_q0[b0 : b0 + nqb[i]] = np.arange(nqb[i]) * block
            seq_meta[i] = (l, l, 0, 0, b0, nqb[i])
            last_idx[i] = t0 + l - 1
            t0 += nqb[i] * block
            b0 += nqb[i]
        max_kvb = 1 << (max(nqb) - 1).bit_length()
        kw = {}
        if self._stateful:
            ss = np.full(bp, self.max_batch, np.int32)  # scratch slot
            for i, r in enumerate(reqs):
                ss[i] = r.state_slot
            kw["state_slots"] = jnp.asarray(ss)
        logits, self.caches = self.adapter.prefill_packed(
            self.params, self.caches,
            jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(blk_seq), jnp.asarray(blk_q0), jnp.asarray(seq_meta),
            jnp.asarray(last_idx), jnp.asarray(slot_loc), max_kvb=max_kvb, **kw,
        )
        for i, r in enumerate(reqs):
            self._finish_prefill(r, logits[i : i + 1])

    def _prefill(self, req: Request):
        pre = req.prefix_len
        total = len(req.prompt)
        if self.prefill_chunk is not None:
            while total - pre > self.prefill_chunk:
                self._prefill_range(req, pre, pre + self.prefill_chunk)
                pre = pre + self.prefill_chunk
        logits = self._prefill_range(req, pre, total)
        self._finish_prefill(req, logits)

    def _advance_prefilling(self, skip=None):
        """One chunk of progress per interleaved-prefill request, so the
        subsequent decode batch of this same step isn't starved. ``skip``:
        a request already advanced this tick by the fused mixed step."""
        still = []
        for req in self.prefilling:
            if req is skip:
                still.append(req)
                continue
            total = len(req.prompt)
            end = min(req.prefill_pos + self.prefill_chunk, total)
            with self.metrics.time("prefill"):
                logits = self._prefill_range(req, req.prefill_pos, end)
            self.metrics.inc("tokens_prefilled", end - req.prefill_pos)
            req.prefill_pos = end
            if end == total:
                self._finish_prefill(req, logits)
                self.running.append(req)
            else:
                still.append(req)
        self.prefilling = still

    def _prefill_range(self, req: Request, pre: int, end: int):
        s = end - pre
        bucket = max(self.prefill_bucket, 1 << (s - 1).bit_length())
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :s] = req.prompt[pre:end]
        positions = np.zeros((1, bucket), np.int32)
        positions[0, :s] = np.arange(pre, pre + s)
        slot_loc = np.full((1, bucket), -1, np.int32)
        slot_loc[0, :s] = [self._slot(req, p) for p in range(pre, end)]
        if pre == 0:
            if self._pprefill is not None:
                kw = ({"state_slots": jnp.asarray([req.state_slot], jnp.int32)}
                      if self._stateful else {})
                logits, self.caches = self._pprefill(
                    self.params, self.caches,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray([s], jnp.int32), jnp.asarray(slot_loc), **kw,
                )
            else:
                kw = ({"state_slots": jnp.asarray([req.state_slot], jnp.int32)}
                      if self._stateful else {})
                logits, self.caches = self.adapter.prefill(
                    self.params, self.caches,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray([s], jnp.int32), jnp.asarray(slot_loc), **kw,
                )
        else:
            prefix_max = cdiv(pre, self.page_size) * self.page_size
            kw = ({"state_slots": jnp.asarray([req.state_slot], jnp.int32)}
                  if self._stateful else {})
            logits, self.caches = self.adapter.prefill_extend(
                self.params, self.caches,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray([s], jnp.int32), jnp.asarray([pre + s], jnp.int32),
                jnp.asarray(self._page_table(req)[None]), jnp.asarray(slot_loc),
                prefix_max=prefix_max, **kw,
            )
        return logits

    def _finish_prefill(self, req: Request, logits):
        if self.draft_cfg is not None:
            sfull = len(req.prompt)
            bucket_d = max(self.prefill_bucket, 1 << (sfull - 1).bit_length())
            dt = np.zeros((1, bucket_d), np.int32)
            dt[0, :sfull] = req.prompt
            dp = np.zeros((1, bucket_d), np.int32)
            dp[0, :sfull] = np.arange(sfull)
            dsl = np.full((1, bucket_d), -1, np.int32)
            dsl[0, :sfull] = [self._slot(req, p) for p in range(sfull)]
            _, self.dk_cache, self.dv_cache = llama.prefill(
                self.draft_params, self.draft_cfg, self.dk_cache, self.dv_cache,
                jnp.asarray(dt), jnp.asarray(dp), jnp.asarray([sfull], jnp.int32),
                jnp.asarray(dsl), self.draft_rope,
            )
        self._append_token(req, logits[0])

    def _append_token(self, req: Request, logits):
        if req.grammar is not None:
            from ..ops.grammar import apply_token_bitmask

            mask = req.grammar(req.output) if callable(req.grammar) else req.grammar
            mask = jnp.asarray(mask, jnp.int32)
            assert mask.shape[-1] * 32 >= logits.shape[-1], "bitmask must cover the vocab"
            logits = apply_token_bitmask(logits[None], mask[None])[0]
        self._key, sub = jax.random.split(self._key)
        if req.temperature == 0.0:
            tok = int(jnp.argmax(logits))
        else:
            tok = int(sample_tokens(
                logits[None], sub, temperature=req.temperature,
                top_k=None if req.top_k is None else jnp.asarray([req.top_k]),
                top_p=None if req.top_p is None else jnp.asarray([req.top_p]),
                min_p=None if req.min_p is None else jnp.asarray([req.min_p]),
            )[0])
        req.output.append(tok)
        if len(req.output) >= req.max_new_tokens or tok in req.stop_tokens:
            req.done = True

    def _decode_batch(self):
        reqs = [r for r in self.running if not r.done]
        if not reqs:
            return
        if (self.draft_cfg is not None
                and all(r.temperature == 0.0 and r.grammar is None for r in reqs)):
            return self._spec_decode_batch(reqs)
        if (self.decode_burst > 1 and self._pstep is None
                and all(r.temperature == 0.0 and r.grammar is None for r in reqs)):
            burst = min(self.decode_burst,
                        min(r.max_new_tokens - len(r.output) for r in reqs))
            if burst > 1:
                return self._decode_burst_batch(reqs, burst)
        b = len(reqs)
        bp = self.max_batch  # pad to fixed batch for stable compilation
        tokens = np.zeros(bp, np.int32)
        positions = np.zeros(bp, np.int32)
        lengths = np.zeros(bp, np.int32)
        slot_loc = np.full(bp, -1, np.int32)
        tables = self._batch_tables(reqs, bp)
        for i, r in enumerate(reqs):
            pos = r.seq_len - 1  # position of the token being fed
            tokens[i] = r.output[-1] if r.output else r.prompt[-1]
            positions[i] = pos
            lengths[i] = r.seq_len
            slot_loc[i] = self._slot(r, pos)
        if self._pstep is not None:
            kw = {}
            if self._stateful:
                ss = np.full(bp, self.max_batch, np.int32)  # scratch slot
                for i, r in enumerate(reqs):
                    ss[i] = r.state_slot
                kw["state_slots"] = jnp.asarray(ss)
            logits, self.caches = self._pstep(
                self.params, self.caches,
                jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
                jnp.asarray(lengths), jnp.asarray(slot_loc), **kw,
            )
        else:
            kw = {}
            if self._stateful:
                ss = np.full(bp, self.max_batch, np.int32)  # scratch slot
                for i, r in enumerate(reqs):
                    ss[i] = r.state_slot
                kw["state_slots"] = jnp.asarray(ss)
            logits, self.caches = self.adapter.decode(
                self.params, self.caches,
                jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
                jnp.asarray(lengths), jnp.asarray(slot_loc), **kw,
            )
        logits_np = logits[:b]
        for i, r in enumerate(reqs):
            self._append_token(r, logits_np[i])
        self.metrics.inc("tokens_decoded", b)
        self.metrics.set_gauge("decode_batch", b)

    def _make_burst_fn(self, burst: int):
        adapter = self.adapter
        page = self.page_size

        def fn(params, caches, tokens, positions, tables, lengths, slot_loc,
               state_slots=None):
            kw = {} if state_slots is None else {"state_slots": state_slots}

            def body(carry, _):
                tokens, caches, positions, lengths, slot_loc = carry
                logits, caches = adapter.decode(
                    params, caches, tokens, positions, tables, lengths,
                    slot_loc, **kw)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                positions = positions + 1
                lengths = lengths + 1
                rows = jnp.arange(tables.shape[0])
                slot_loc = jnp.where(
                    slot_loc >= 0,
                    tables[rows, positions // page] * page + positions % page,
                    -1,
                )
                return (nxt, caches, positions, lengths, slot_loc), nxt

            (tok, caches, _, _, _), toks = jax.lax.scan(
                body, (tokens, caches, positions, lengths, slot_loc),
                None, length=burst)
            return jnp.swapaxes(toks, 0, 1), caches  # [B, burst]

        return jax.jit(fn)

    def _decode_burst_batch(self, reqs, burst: int):
        b = len(reqs)
        bp = self.max_batch
        tokens = np.zeros(bp, np.int32)
        positions = np.zeros(bp, np.int32)
        lengths = np.ones(bp, np.int32)
        slot_loc = np.full(bp, -1, np.int32)
        tables = self._batch_tables(reqs, bp)
        for i, r in enumerate(reqs):
            pos = r.seq_len - 1
            tokens[i] = r.output[-1] if r.output else r.prompt[-1]
            positions[i] = pos
            lengths[i] = r.seq_len
            slot_loc[i] = self._slot(r, pos)
        if burst not in self._burst_fns:
            self._burst_fns[burst] = self._make_burst_fn(burst)
        bkw = {}
        if self._stateful:
            ss = np.full(bp, self.max_batch, np.int32)
            for i, r in enumerate(reqs):
                ss[i] = r.state_slot
            bkw["state_slots"] = jnp.asarray(ss)
        toks, self.caches = self._burst_fns[burst](
            self.params, self.caches,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
            jnp.asarray(lengths), jnp.asarray(slot_loc), **bkw,
        )
        toks = np.asarray(toks)
        for i, r in enumerate(reqs):
            for t in toks[i]:
                r.output.append(int(t))
                self.metrics.inc("tokens_decoded")
                if int(t) in r.stop_tokens:
                    r.done = True
                    break
            if len(r.output) >= r.max_new_tokens:
                r.done = True
        self.metrics.set_gauge("decode_batch", b)

    def _spec_decode_batch(self, reqs):
        from ..models import spec

        b = len(reqs)
        bp = self.max_batch
        tokens = np.zeros(bp, np.int32)
        lengths = np.ones(bp, np.int32)
        valid = np.zeros(bp, bool)
        tables = self._batch_tables(reqs, bp)
        for i, r in enumerate(reqs):
            tokens[i] = r.output[-1] if r.output else r.prompt[-1]
            lengths[i] = r.seq_len
            valid[i] = True
        slack = self.spec_gamma * self.spec_topk
        prefix_max = max(self.page_size, cdiv(int(lengths.max()) + slack, self.page_size) * self.page_size)
        if self.spec_topk > 1:
            kct, vct = self.caches
            new, n_new, kct, vct, self.dk_cache, self.dv_cache = spec.spec_tree_round(
                self.params, self.draft_params,
                kct, vct, self.dk_cache, self.dv_cache,
                jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(tables),
                self.rope_cache, self.draft_rope, jnp.asarray(valid),
                cfg_t=self.cfg, cfg_d=self.draft_cfg, gamma=self.spec_gamma,
                topk=self.spec_topk, prefix_max=prefix_max,
            )
            self.caches = (kct, vct)
        else:
            new, n_new, caches_t, self.dk_cache, self.dv_cache = spec.spec_decode_round(
                self.params, self.draft_params,
                tuple(self.caches), self.dk_cache, self.dv_cache,
                jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(tables),
                self.rope_cache, self.draft_rope, jnp.asarray(valid),
                cfg_t=self.cfg, cfg_d=self.draft_cfg, gamma=self.spec_gamma,
                prefix_max=prefix_max, target=self.adapter._m,
            )
            self.caches = tuple(caches_t)
        new = np.asarray(new)
        n_new = np.asarray(n_new)
        # n_new per request = accepted drafts + 1 bonus token (models/spec.py)
        self.metrics.inc("spec_proposed", self.spec_gamma * b)
        self.metrics.inc("spec_accepted", int(n_new[:b].sum()) - b)
        for i, r in enumerate(reqs):
            take = min(int(n_new[i]), r.max_new_tokens - len(r.output))
            for x in new[i, :take]:
                r.output.append(int(x))
                self.metrics.inc("tokens_decoded")
                if int(x) in r.stop_tokens:
                    r.done = True
                    break
            if len(r.output) >= r.max_new_tokens:
                r.done = True

    def _try_mixed_step(self):
        """Fuse the first in-flight prefill chunk with this tick's decode
        batch into one dispatch (llama-family mixed_step). Returns the
        prefill Request it advanced (so the caller skips it in
        _advance_prefilling), or None when the plain path should run."""
        if not self.enable_mixed:
            return None
        if not self.prefilling or self._pstep is not None or self._stateful:
            return None
        if self.draft_cfg is not None or self.decode_burst > 1:
            return None
        if getattr(self.adapter, "_m", None) is None or not hasattr(self.adapter._m, "mixed_step"):
            return None
        reqs = [r for r in self.running if not r.done]
        if not reqs:
            return None
        pf = self.prefilling[0]
        pre = pf.prefill_pos
        if pre == 0:
            return None  # first chunk has no cached prefix; plain path
        total = len(pf.prompt)
        end = min(pre + self.prefill_chunk, total)
        s = end - pre
        bucket = max(self.prefill_bucket, 1 << (s - 1).bit_length())
        pf_tokens = np.zeros(bucket, np.int32)
        pf_tokens[:s] = pf.prompt[pre:end]
        pf_positions = np.zeros(bucket, np.int32)
        pf_positions[:s] = np.arange(pre, end)
        pf_slots = np.full(bucket, -1, np.int32)
        pf_slots[:s] = [self._slot(pf, p) for p in range(pre, end)]
        prefix_max = cdiv(pre, self.page_size) * self.page_size

        bp = self.max_batch
        tokens = np.zeros(bp, np.int32)
        positions = np.zeros(bp, np.int32)
        lengths = np.ones(bp, np.int32)
        slot_loc = np.full(bp, -1, np.int32)
        tables = self._batch_tables(reqs, bp)
        for i, r in enumerate(reqs):
            pos = r.seq_len - 1
            tokens[i] = r.output[-1] if r.output else r.prompt[-1]
            positions[i] = pos
            lengths[i] = r.seq_len
            slot_loc[i] = self._slot(r, pos)

        k, v = self.caches
        with self.metrics.time("mixed"):
            dec_logits, pf_logits, k, v = self.adapter._m.mixed_step(
                self.params, self.cfg, k, v,
                jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
                jnp.asarray(lengths), jnp.asarray(slot_loc),
                jnp.asarray(pf_tokens), jnp.asarray(pf_positions),
                jnp.asarray(s, jnp.int32), jnp.asarray(end, jnp.int32),
                jnp.asarray(self._page_table(pf)), jnp.asarray(pf_slots),
                self.rope_cache, prefix_max=prefix_max,
            )
        self.caches = (k, v)
        dec_np = dec_logits[: len(reqs)]
        for i, r in enumerate(reqs):
            self._append_token(r, dec_np[i])
        self.metrics.inc("tokens_decoded", len(reqs))
        self.metrics.inc("tokens_prefilled", s)
        self.metrics.inc("mixed_steps")
        pf.prefill_pos = end
        if end == total:
            self.prefilling.remove(pf)
            self._finish_prefill(pf, pf_logits[None])
            self.running.append(pf)
        return pf

    def _retire(self):
        still = []
        for r in self.running:
            if not r.done:
                still.append(r)
                continue
            if self.native is not None:
                seq = r.prompt + r.output
                # The final emitted token was never fed through the model, so
                # its KV slot is unwritten: only positions [0, len(seq)-1) hold
                # valid KV. Inserting a page containing that slot would poison
                # later prefix-cache hits with a garbage row.
                full_pages = (len(seq) - 1) // self.page_size
                adopted = 0
                if full_pages > 0:
                    adopted = self.native.insert_prefix(
                        seq[: full_pages * self.page_size], r.pages[:full_pages]
                    )
                # ownership: pages[:shared_pages] were cache-owned already;
                # the adopted tail of the full-page range now belongs to the
                # cache; everything else returns to the free list
                keep = set(range(r.shared_pages)) | set(range(full_pages - adopted, full_pages))
                release = [p for i, p in enumerate(r.pages) if i not in keep]
                if release:
                    self.allocator.release(release)
                if r.lock_id:
                    self.native.unlock(r.lock_id)
                    r.lock_id = 0
            else:
                self.allocator.release(r.pages)
            r.pages = []
            if self._stateful and r.state_slot >= 0:
                self._free_state_slots.append(r.state_slot)
                r.state_slot = -1
            self.finished[r.rid] = r
            self.metrics.inc("requests_finished")
        self.running = still

    # ------------------------------------------------------------------
    def step(self):
        """One scheduler iteration: admit+prefill, one decode step, retire.

        When a chunked prefill is in flight alongside a decode batch, the
        first chunk advance and the decode step fuse into ONE dispatch
        (adapter-family mixed_step; the reference's chunkprefill
        two-launch/one-output scheme, flash_attention.cpp:1207-1325) so
        decode never waits a whole tick behind a prefill chunk and the
        layer weights stream once for both."""
        with self.metrics.time("step"):
            self._admit()
            mixed_pf = self._try_mixed_step()  # Request served fused, or None
            self._advance_prefilling(skip=mixed_pf)
            if mixed_pf is None:
                # timer inside the branch: a fused tick must not log a ~0
                # "decode" sample (it would collapse p50 decode latency
                # exactly when the system is busiest)
                with self.metrics.time("decode"):
                    self._decode_batch()
            self._retire()
        self.metrics.inc("scheduler_steps")
        free = self.allocator.free  # int (native) or free-list (python)
        self.metrics.set_gauge("free_pages", free if isinstance(free, int) else len(free))
        self.metrics.set_gauge("running", len(self.running))
        self.metrics.set_gauge("waiting", len(self.waiting))
        if self.log_every and self.metrics.counters["scheduler_steps"] % self.log_every == 0:
            logger.info(self.metrics.log_line())

    def run_until_done(self, max_steps: int = 10_000):
        steps = 0
        while (self.waiting or self.prefilling or self.running) and steps < max_steps:
            self.step()
            steps += 1
        return self.finished
