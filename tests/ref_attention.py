"""Shared numpy attention oracle for the attention test files.

Mirrors the reference test pattern (tests/test_flash_attention.py builds an
in-test torch reference); here it is numpy fp64 with the same feature set:
GQA, causal with chunked-prefill offset, sliding window, softcap, sinks.
"""

import numpy as np


def ref_attention(
    q,  # [Sq, Hq, D]
    k,  # [Skv, Hkv, D]
    v,  # [Skv, Hkv, D]
    *,
    causal=True,
    sm_scale=None,
    window=None,
    soft_cap=None,
    sinks=None,  # [Hq]
    q_len=None,
    kv_len=None,
):
    sq, hq, d = q.shape
    skv, hkv, _ = k.shape
    group = hq // hkv
    q_len = sq if q_len is None else q_len
    kv_len = skv if kv_len is None else kv_len
    sm_scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(d)
    off = kv_len - q_len

    out = np.zeros((sq, hq, d), np.float64)
    lse = np.full((hq, sq), -np.inf)
    for h in range(hq):
        kh = k[:, h // group].astype(np.float64)
        vh = v[:, h // group].astype(np.float64)
        s = q[:, h].astype(np.float64) @ kh.T * sm_scale  # [Sq, Skv]
        if soft_cap is not None:
            s = soft_cap * np.tanh(s / soft_cap)
        cols = np.arange(skv)[None, :]
        rows = np.arange(sq)[:, None]
        mask = np.broadcast_to(cols < kv_len, (sq, skv)).copy()
        if causal:
            mask &= cols <= rows + off
        if window is not None:
            mask &= cols > rows + off - window
        s = np.where(mask, s, -np.inf)
        m = s.max(-1, keepdims=True)
        m = np.maximum(m, -1e30)
        p = np.exp(s - m)
        l = p.sum(-1, keepdims=True)
        if sinks is not None:
            l = l + np.exp(sinks[h] - m)
        out[:, h] = (p @ vh) / np.maximum(l, 1e-38)
        lse[h] = ((m + np.log(np.maximum(l, 1e-38))) * np.log2(np.e))[:, 0]
    return out, lse
