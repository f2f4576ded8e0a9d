"""GDN (Gated DeltaNet) linear attention — Qwen3-Next style.

TPU-native equivalent of the reference's fused GDN stack
(src/sycl/gdn_attn/: unzip qkvz/ba -> causal conv1d -> L2 norm -> chunked
gated delta rule with conv+ssm state caches; include/sgl_kernel_ops.h:1124-1169).

Recurrence (gated delta rule, the math contract of the reference's
chunk_gated_delta_rule kernels):

    g_t    = -exp(A_log) * softplus(a_t + dt_bias)      (log decay)
    beta_t = sigmoid(b_t)
    S_t    = exp(g_t) * S_{t-1}
    o_t    = S_t q_t ;  S_t += beta_t (v_t - S_t k_t) k_t^T

Prefill runs the recurrence as a lax.scan over time with per-sequence
length masking (state freezes past seq_len); decode is the single-step
update. The fused qkvz/ba unzip follows the Qwen3-Next grouped layout:
qkvz [T, Hk, 2*dk + 2*G*dv] = [q | k | v(G heads) | z(G heads)],
ba [T, Hk, 2*G] = [b | a], where G = Hv // Hk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..norm import l2norm
from .causal_conv1d import causal_conv1d_fwd, causal_conv1d_update


def unzip_qkvz_ba(qkvz, ba, num_k_heads: int, num_v_heads: int, head_k_dim: int, head_v_dim: int):
    """Split the fused projections.

    qkvz: [..., Hk * (2*dk + 2*G*dv)]; ba: [..., Hk * 2*G], G = Hv // Hk.
    Returns q [..., Hk, dk], k [..., Hk, dk], v [..., Hv, dv],
    z [..., Hv, dv], b [..., Hv], a [..., Hv].
    """
    g = num_v_heads // num_k_heads
    dk, dv = head_k_dim, head_v_dim
    lead = qkvz.shape[:-1]
    grouped = qkvz.reshape(*lead, num_k_heads, 2 * dk + 2 * g * dv)
    q = grouped[..., :dk]
    k = grouped[..., dk : 2 * dk]
    v = grouped[..., 2 * dk : 2 * dk + g * dv].reshape(*lead, num_v_heads, dv)
    z = grouped[..., 2 * dk + g * dv :].reshape(*lead, num_v_heads, dv)
    ba_g = ba.reshape(*lead, num_k_heads, 2 * g)
    b = ba_g[..., :g].reshape(*lead, num_v_heads)
    a = ba_g[..., g:].reshape(*lead, num_v_heads)
    return q, k, v, z, b, a


@jax.jit
def gated_delta_rule_update(q, k, v, g, beta, state):
    """One decode step. q/k [B, H, dk] (L2-normalized), v [B, H, dv],
    g [B, H] log-decay, beta [B, H]; state [B, H, dv, dk].
    Returns (o [B, H, dv], new state)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = state.astype(jnp.float32) * jnp.exp(g.astype(jnp.float32))[..., None, None]
    mem = jnp.einsum("bhvk,bhk->bhv", s, kf)
    delta = (vf - mem) * beta.astype(jnp.float32)[..., None]
    s = s + jnp.einsum("bhv,bhk->bhvk", delta, kf)
    o = jnp.einsum("bhvk,bhk->bhv", s, qf)
    return o.astype(v.dtype), s.astype(state.dtype)


@jax.jit
def gated_delta_rule_scan(q, k, v, g, beta, initial_state=None, seq_lens=None):
    """Reference per-timestep recurrence (lax.scan over time). Kept as the
    oracle for the chunked-parallel form below; O(S) sequential steps."""
    b, s, h, dk = q.shape
    dv = v.shape[-1]
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dv, dk), jnp.float32)
    if seq_lens is None:
        seq_lens = jnp.full((b,), s, jnp.int32)

    def step(state, inputs):
        qt, kt, vt, gt, bt, valid = inputs  # [B, H, ...], valid [B]
        o, new_state = gated_delta_rule_update(qt, kt, vt, gt, bt, state)
        vm = valid[:, None, None, None]
        new_state = jnp.where(vm, new_state, state)
        return new_state, jnp.where(valid[:, None, None], o, 0.0)

    ts = jnp.arange(s)
    valid = ts[None, :] < seq_lens[:, None]  # [B, S]
    xs = (
        jnp.moveaxis(q, 1, 0), jnp.moveaxis(k, 1, 0), jnp.moveaxis(v, 1, 0),
        jnp.moveaxis(g, 1, 0), jnp.moveaxis(beta, 1, 0), jnp.moveaxis(valid, 1, 0),
    )
    final_state, o = jax.lax.scan(step, initial_state.astype(jnp.float32), xs)
    return jnp.moveaxis(o, 0, 1).astype(v.dtype), final_state.astype(initial_state.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def chunk_gated_delta_rule(q, k, v, g, beta, initial_state=None, seq_lens=None, *, chunk: int = 64):
    """Chunked-parallel gated delta rule (WY representation).

    Reference analog: src/sycl/kernels/gdn_attn/
    chunk_gated_delta_rule_kernels_xe20.hpp — the chunked form that turns
    the O(S)-sequential delta-rule recurrence into per-chunk MXU matmuls
    plus an S/chunk-step inter-chunk state scan.

    Derivation (S_t [dv, dk]; gamma_t = exp(g_t)):
        S_t = gamma_t S_{t-1} + u_t k_t^T,  u_t = beta_t (v_t - gamma_t S_{t-1} k_t)
    Within a chunk with inclusive local decay G_t = sum_{j<=t} g_j:
        (I + A) U = beta (V - e^G K S_0^T),  A[t,i] = beta_t e^{G_t-G_i} (k_t.k_i) 1[i<t]
    so with Tinv = (I + A)^{-1}:
        U  = U0 - W S_0^T,  U0 = Tinv (beta V),  W = Tinv (beta e^G K)
        O  = (e^G Q) S_0^T + M U,   M[t,i] = e^{G_t-G_i} (q_t.k_i) 1[i<=t]
        S' = e^{G_C} S_0 + sum_t e^{G_C-G_t} u_t k_t^T
    U0, W, Tinv, M have no cross-chunk dependency and batch over
    (B, H, n_chunks); only the cheap S' recurrence is sequential.

    q/k [B, S, H, dk], v [B, S, H, dv], g/beta [B, S, H];
    initial_state [B, H, dv, dk]; seq_lens [B].
    Returns (o [B, S, H, dv], final_state); state freezes beyond seq_len.
    """
    b, s, h, dk = q.shape
    dv = v.shape[-1]
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dv, dk), jnp.float32)
    if seq_lens is None:
        seq_lens = jnp.full((b,), s, jnp.int32)
    c = min(chunk, s)
    pad = (-s) % c
    n = (s + pad) // c

    def prep(x, fill=0.0):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2), constant_values=fill)
        # [B, S', H, ...] -> [B, H, N, C, ...]
        x = jnp.moveaxis(x, 2, 1)
        return x.reshape(b, h, n, c, *x.shape[3:])

    valid = (jnp.arange(s + pad)[None, :] < seq_lens[:, None])[:, :, None]  # [B, S', 1]
    valid_s = valid[:, :s]  # [B, S, 1]
    gm = prep(jnp.where(valid_s, g.astype(jnp.float32), 0.0))
    bm = prep(jnp.where(valid_s, beta.astype(jnp.float32), 0.0))
    qc, kc, vc = prep(q), prep(k), prep(v)

    G = jnp.cumsum(gm, axis=-1)                      # [B,H,N,C] inclusive
    eG = jnp.exp(G)
    tri_s = jnp.tril(jnp.ones((c, c), bool), k=-1)   # strict lower
    tri = jnp.tril(jnp.ones((c, c), bool))           # inclusive
    rel = jnp.exp(G[..., :, None] - G[..., None, :])  # e^{G_t - G_i}
    kk = jnp.einsum("bhntd,bhnid->bhnti", kc, kc)
    A = jnp.where(tri_s, bm[..., :, None] * rel * kk, 0.0)
    eye = jnp.eye(c, dtype=jnp.float32)
    Tinv = jax.scipy.linalg.solve_triangular(eye + A, jnp.broadcast_to(eye, A.shape), lower=True)
    U0 = jnp.einsum("bhnti,bhniv->bhntv", Tinv, bm[..., None] * vc)
    W = jnp.einsum("bhnti,bhnid->bhntd", Tinv, (bm * eG)[..., None] * kc)
    qk = jnp.einsum("bhntd,bhnid->bhnti", qc, kc)
    M = jnp.where(tri, rel * qk, 0.0)
    eGq = eG[..., None] * qc                          # [B,H,N,C,dk]
    carry_decay = jnp.exp(G[..., -1])                 # e^{G_C} [B,H,N]
    tail_decay = jnp.exp(G[..., -1:] - G)             # e^{G_C - G_t} [B,H,N,C]

    def step(S, xs):
        u0, w, m_mat, egq, kcn, cdec, tdec = xs
        # S [B,H,dv,dk]
        u = u0 - jnp.einsum("bhtd,bhvd->bhtv", w, S)           # [B,H,C,dv]
        o = jnp.einsum("bhtd,bhvd->bhtv", egq, S) + jnp.einsum("bhti,bhiv->bhtv", m_mat, u)
        S_new = cdec[..., None, None] * S + jnp.einsum("bht,bhtv,bhtd->bhvd", tdec, u, kcn)
        return S_new, o

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (U0, W, M, eGq, kc, carry_decay, tail_decay))
    final_state, o = jax.lax.scan(step, initial_state.astype(jnp.float32), xs)
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, n * c, dv)[:, :, :s]  # [B,H,S,dv]
    o = jnp.moveaxis(o, 1, 2)
    o = jnp.where(valid[:, :s, :, None], o, 0.0)
    return o.astype(v.dtype), final_state.astype(initial_state.dtype)


def _decay_terms(a, b, a_log, dt_bias):
    g = -jnp.exp(a_log.astype(jnp.float32)) * jax.nn.softplus(a.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    return g, beta


@functools.partial(
    jax.jit,
    static_argnames=("num_k_heads", "num_v_heads", "head_k_dim", "head_v_dim", "activation"),
)
def gdn_attention_prefill(
    qkvz,
    ba,
    conv_weight,
    conv_bias,
    a_log,
    dt_bias,
    conv_state,
    ssm_state,
    seq_lens,
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
    activation: str = "silu",
):
    """Full GDN layer prefill (reference gdn_attention, prefill sub-batch):
    unzip -> causal conv (over the concatenated qkv feature dim) -> L2 norm
    q/k -> gated delta rule -> z-gated output.

    qkvz [B, S, Hk*(2dk+2G*dv)]; ba [B, S, Hk*2G]; conv_weight
    [conv_dim, W] with conv_dim = Hk*2dk + Hv*dv; conv/ssm states carried.
    Returns (core_out [B, S, Hv, dv], z [B, S, Hv, dv], conv_state, ssm_state).
    """
    bsz, s, _ = qkvz.shape
    q, k, v, z, b, a = unzip_qkvz_ba(qkvz, ba, num_k_heads, num_v_heads, head_k_dim, head_v_dim)
    # conv over concatenated [q | k | v] features (reference conv path)
    mixed = jnp.concatenate(
        [q.reshape(bsz, s, -1), k.reshape(bsz, s, -1), v.reshape(bsz, s, -1)], axis=-1
    )
    conv_out, conv_state = causal_conv1d_fwd(
        mixed, conv_weight, conv_bias, seq_lens, conv_state, activation=activation
    )
    nk = num_k_heads * head_k_dim
    q = conv_out[..., :nk].reshape(bsz, s, num_k_heads, head_k_dim)
    k = conv_out[..., nk : 2 * nk].reshape(bsz, s, num_k_heads, head_k_dim)
    v = conv_out[..., 2 * nk :].reshape(bsz, s, num_v_heads, head_v_dim)
    # reference q scale: HF modeling_qwen3_next torch_chunk/recurrent_
    # gated_delta_rule applies q * dk**-0.5 AFTER the L2 norm
    q = l2norm(q) * (head_k_dim ** -0.5)
    k = l2norm(k)
    # broadcast k-heads to v-heads (GQA-style grouping)
    g_rep = num_v_heads // num_k_heads
    q = jnp.repeat(q, g_rep, axis=2)
    k = jnp.repeat(k, g_rep, axis=2)
    g, beta = _decay_terms(a, b, a_log, dt_bias)
    o, ssm_state = chunk_gated_delta_rule(q, k, v, g, beta, ssm_state, seq_lens)
    return o, z, conv_state, ssm_state


@functools.partial(
    jax.jit,
    static_argnames=("num_k_heads", "num_v_heads", "head_k_dim", "head_v_dim", "activation"),
)
def gdn_attention_decode(
    qkvz,
    ba,
    conv_weight,
    conv_bias,
    a_log,
    dt_bias,
    conv_state,
    ssm_state,
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
    activation: str = "silu",
):
    """Single-token GDN step (reference gdn_attention, decode sub-batch).
    qkvz [B, Hk*(2dk+2G*dv)]; returns (o [B, Hv, dv], z, conv_state, ssm_state)."""
    bsz = qkvz.shape[0]
    q, k, v, z, b, a = unzip_qkvz_ba(qkvz, ba, num_k_heads, num_v_heads, head_k_dim, head_v_dim)
    mixed = jnp.concatenate([q.reshape(bsz, -1), k.reshape(bsz, -1), v.reshape(bsz, -1)], axis=-1)
    conv_out, conv_state = causal_conv1d_update(mixed, conv_state, conv_weight, conv_bias, activation=activation)
    nk = num_k_heads * head_k_dim
    q = l2norm(conv_out[..., :nk].reshape(bsz, num_k_heads, head_k_dim)) * (head_k_dim ** -0.5)
    k = l2norm(conv_out[..., nk : 2 * nk].reshape(bsz, num_k_heads, head_k_dim))
    v = conv_out[..., 2 * nk :].reshape(bsz, num_v_heads, head_v_dim)
    g_rep = num_v_heads // num_k_heads
    q = jnp.repeat(q, g_rep, axis=1)
    k = jnp.repeat(k, g_rep, axis=1)
    g, beta = _decay_terms(a, b, a_log, dt_bias)
    o, ssm_state = gated_delta_rule_update(q, k, v, g, beta, ssm_state)
    return o, z, conv_state, ssm_state
