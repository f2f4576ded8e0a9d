"""Chain speculative decoding parity: greedy spec must emit exactly the
target model's plain greedy stream (losslessness), for both a good draft
(= target) and an adversarial draft (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama, spec


def _setup(cfg, params, prompts, num_pages=16, page=16):
    b = len(prompts)
    s = max(len(p) for p in prompts)
    kc, vc = llama.make_caches(cfg, num_pages, page)
    rope = llama.build_rope_cache(cfg)
    tokens = np.zeros((b, s), np.int32)
    positions = np.zeros((b, s), np.int32)
    slot = np.full((b, s), -1, np.int32)
    tables = np.zeros((b, num_pages // b), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, : len(p)] = p
        positions[i, : len(p)] = np.arange(len(p))
        pages_i = np.arange(num_pages // b) + i * (num_pages // b)
        tables[i] = pages_i
        slot[i, : len(p)] = pages_i[np.arange(len(p)) // page] * page + np.arange(len(p)) % page
    q_lens = jnp.asarray([len(p) for p in prompts], jnp.int32)
    logits, kc, vc = llama.prefill(
        params, cfg, kc, vc, jnp.asarray(tokens), jnp.asarray(positions), q_lens,
        jnp.asarray(slot), rope,
    )
    first = np.asarray(jnp.argmax(logits, -1), np.int32)
    return kc, vc, rope, jnp.asarray(tables), first


def _greedy_decode(cfg, params, prompts, n_new, **kw):
    kc, vc, rope, tables, first = _setup(cfg, params, prompts, **kw)
    b = len(prompts)
    page = kc.shape[-2]
    toks = [list(p) + [int(first[i])] for i, p in enumerate(prompts)]
    for _ in range(n_new - 1):
        last = jnp.asarray([t[-1] for t in toks], jnp.int32)
        lens = jnp.asarray([len(t) for t in toks], jnp.int32)
        pos = lens - 1
        sl = jnp.take_along_axis(tables, pos[:, None] // page, axis=1)[:, 0] * page + pos % page
        logits, kc, vc = llama.decode_step(
            params, cfg, kc, vc, last, pos, tables, lens, sl, rope
        )
        nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
        for i in range(b):
            toks[i].append(int(nxt[i]))
    return [t[len(p):] for t, p in zip(toks, prompts)]


def _spec_decode(cfg_t, params_t, cfg_d, params_d, prompts, n_new, gamma=3, **kw):
    kct, vct, ropet, tables, first = _setup(cfg_t, params_t, prompts, **kw)
    kcd, vcd, roped, _, _ = _setup(cfg_d, params_d, prompts, **kw)
    b = len(prompts)
    toks = [list(p) + [int(first[i])] for i, p in enumerate(prompts)]
    done = [len(t) + n_new - 1 for t in toks]  # absolute target lengths
    while any(len(t) < d for t, d in zip(toks, done)):
        last = jnp.asarray([t[-1] for t in toks], jnp.int32)
        lens = jnp.asarray([len(t) for t in toks], jnp.int32)
        new, n_new_b, (kct, vct), kcd, vcd = spec.spec_decode_round(
            params_t, params_d, (kct, vct), kcd, vcd, last, lens, tables, ropet, roped,
            cfg_t=cfg_t, cfg_d=cfg_d, gamma=gamma, prefix_max=64,
        )
        new = np.asarray(new)
        for i in range(b):
            take = min(int(n_new_b[i]), done[i] - len(toks[i]))
            toks[i] += [int(x) for x in new[i, :take]]
    return [t[len(p):] for t, p in zip(toks, prompts)]


@pytest.fixture(scope="module")
def models():
    cfg_t = llama.LlamaConfig.tiny()
    cfg_d = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=32, max_position=256, dtype=jnp.float32,
    )
    params_t = llama.init_weights(cfg_t, jax.random.PRNGKey(0))
    params_d = llama.init_weights(cfg_d, jax.random.PRNGKey(7))
    return cfg_t, params_t, cfg_d, params_d


class TestSpecChain:
    def test_perfect_draft_accepts_everything(self, models):
        cfg_t, params_t, _, _ = models
        prompts = [[1, 2, 3], [9, 8, 7, 6]]
        ref = _greedy_decode(cfg_t, params_t, prompts, 8)
        got = _spec_decode(cfg_t, params_t, cfg_t, params_t, prompts, 8, gamma=3)
        assert got == ref
        # with draft == target every round accepts gamma+1 tokens — check
        # via round count: ceil((8-1)/4) rounds suffices (smoke: stream equal)

    def test_adversarial_draft_still_lossless(self, models):
        cfg_t, params_t, cfg_d, params_d = models
        prompts = [[5, 4, 3, 2], [11, 12]]
        ref = _greedy_decode(cfg_t, params_t, prompts, 9)
        got = _spec_decode(cfg_t, params_t, cfg_d, params_d, prompts, 9, gamma=2)
        assert got == ref


def _spec_tree_decode(cfg_t, params_t, cfg_d, params_d, prompts, n_new,
                      gamma=3, topk=2, collect=None, **kw):
    kct, vct, ropet, tables, first = _setup(cfg_t, params_t, prompts, **kw)
    kcd, vcd, roped, _, _ = _setup(cfg_d, params_d, prompts, **kw)
    b = len(prompts)
    toks = [list(p) + [int(first[i])] for i, p in enumerate(prompts)]
    done = [len(t) + n_new - 1 for t in toks]
    while any(len(t) < d for t, d in zip(toks, done)):
        last = jnp.asarray([t[-1] for t in toks], jnp.int32)
        lens = jnp.asarray([len(t) for t in toks], jnp.int32)
        new, n_new_b, kct, vct, kcd, vcd = spec.spec_tree_round(
            params_t, params_d, kct, vct, kcd, vcd, last, lens, tables,
            ropet, roped,
            cfg_t=cfg_t, cfg_d=cfg_d, gamma=gamma, topk=topk, prefix_max=64,
        )
        new = np.asarray(new)
        if collect is not None:
            collect.append(np.asarray(n_new_b).copy())
        for i in range(b):
            take = min(int(n_new_b[i]), done[i] - len(toks[i]))
            toks[i] += [int(x) for x in new[i, :take]]
    return [t[len(p):] for t, p in zip(toks, prompts)]


class TestSpecTree:
    def test_perfect_draft_lossless(self, models):
        cfg_t, params_t, _, _ = models
        prompts = [[1, 2, 3], [9, 8, 7, 6]]
        ref = _greedy_decode(cfg_t, params_t, prompts, 8)
        got = _spec_tree_decode(cfg_t, params_t, cfg_t, params_t, prompts, 8,
                                gamma=3, topk=2)
        assert got == ref

    def test_adversarial_draft_lossless(self, models):
        """Random (wrong) draft: divergent tree acceptance exercises BOTH
        fix-ups (target node-row moves + draft re-extend) — any cache
        corruption shows up as a diverged stream a few tokens later."""
        cfg_t, params_t, cfg_d, params_d = models
        prompts = [[5, 4, 3, 2], [11, 12]]
        ref = _greedy_decode(cfg_t, params_t, prompts, 9)
        got = _spec_tree_decode(cfg_t, params_t, cfg_d, params_d, prompts, 9,
                                gamma=2, topk=3)
        assert got == ref

    def test_tree_accepts_at_least_chain(self, models):
        """The sibling hedge can only help: per round, tree acceptance >=
        chain acceptance on the same (draft, target); over a long run the
        tree must strictly win at least once for a mismatched draft."""
        cfg_t, params_t, cfg_d, params_d = models
        prompts = [[5, 4, 3, 2], [11, 12], [1, 7, 7]]
        tree_n, chain_n = [], []
        got_t = _spec_tree_decode(cfg_t, params_t, cfg_d, params_d, prompts, 16,
                                  gamma=3, topk=3, collect=tree_n)
        ref = _greedy_decode(cfg_t, params_t, prompts, 16)
        assert got_t == ref
        # chain rounds on the same sequence of states: chain accept = the
        # leading-run acceptance, recomputable from the tree's spine --
        # simpler proxy: run chain end-to-end and compare ROUND COUNTS
        # (fewer rounds for the same emitted tokens = longer acceptance)
        chain_rounds = []
        _spec_chain_counted(cfg_t, params_t, cfg_d, params_d, prompts, 16,
                            gamma=3, collect=chain_rounds)
        assert len(tree_n) <= len(chain_rounds), (len(tree_n), len(chain_rounds))


def _spec_chain_counted(cfg_t, params_t, cfg_d, params_d, prompts, n_new,
                        gamma=3, collect=None, **kw):
    kct, vct, ropet, tables, first = _setup(cfg_t, params_t, prompts, **kw)
    kcd, vcd, roped, _, _ = _setup(cfg_d, params_d, prompts, **kw)
    b = len(prompts)
    toks = [list(p) + [int(first[i])] for i, p in enumerate(prompts)]
    done = [len(t) + n_new - 1 for t in toks]
    while any(len(t) < d for t, d in zip(toks, done)):
        last = jnp.asarray([t[-1] for t in toks], jnp.int32)
        lens = jnp.asarray([len(t) for t in toks], jnp.int32)
        new, n_new_b, (kct, vct), kcd, vcd = spec.spec_decode_round(
            params_t, params_d, (kct, vct), kcd, vcd, last, lens, tables, ropet, roped,
            cfg_t=cfg_t, cfg_d=cfg_d, gamma=gamma, prefix_max=64,
        )
        new = np.asarray(new)
        if collect is not None:
            collect.append(np.asarray(n_new_b).copy())
        for i in range(b):
            take = min(int(n_new_b[i]), done[i] - len(toks[i]))
            toks[i] += [int(x) for x in new[i, :take]]
    return [t[len(p):] for t, p in zip(toks, prompts)]
