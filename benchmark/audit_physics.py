#!/usr/bin/env python
"""Physics audit over baseline.json: delete rows whose implied rate beats
the chip (VERDICT r4 #3 — 'no row in baseline.json implies >1.0x a
measured peak').

The report()-time guard stops NEW impossible rows, but a suspect
re-measurement leaves the OLD corrupt value in place (update_baseline
merges). This audit derives bytes/flops from each row's name schema and
purges violators so the next regen re-measures them fresh.

Peaks: v5e 819 GB/s HBM stream, 197 TF bf16 MXU, 394 TOPS int8. A small
tolerance (5%) absorbs rounding in the schema-derived byte counts.
"""

import json
import os
import sys

HBM = 819e9
BF16 = 197e12
INT8 = 394e12
TOL = 1.05


def implied(name: str):
    """(flops, bytes, int_ops) per step derived from the row name; None
    where the schema doesn't encode enough to bound it."""
    fam, _, rest = name.partition(":")
    p = rest.split("-")

    def ints(n):
        return [int(x) for x in p[:n]]

    try:
        if fam == "w4a16_gemm":
            m, n, k = ints(3)
            return 2 * m * n * k, n * k // 2, False
        if fam in ("fp8_scaled_mm", "fp8_blockwise_scaled_mm"):
            m, n, k = ints(3)
            return 2 * m * n * k, m * k + k * n, False
        if fam == "int8_scaled_mm":
            m, n, k = ints(3)
            return 2 * m * n * k, m * k + k * n, True
        if fam == "mla_decode":
            b, ctx, h = ints(3)
            return None, b * ctx * 576 * 2, False
        if fam == "mla_prefill":
            b, s, h = ints(3)
            return 2 * b * h * s * s * (576 + 512), None, False
        if fam.startswith("paged_decode_dma"):
            b, ctx, hq, hkv, d = ints(5)
            it = 1 if any(t in fam for t in ("int8", "fp8", "s4")) else 2
            return None, 2 * b * ctx * hkv * d * it, False
        if fam == "flash_prefill":
            b, s, hq, hkv, d = ints(5)
            return 2 * b * hq * s * s * d, None, False
        if fam == "qserve_w4a8_per_chn" or fam == "qserve_w4a8_per_group":
            m, n, k = ints(3)
            return None, n * k, True
        if fam == "w4a16_grouped_mm":
            # tag-cap-e-n-k; bank bytes = routed fraction unknown -> skip
            return None, None, False
        if fam in ("rmsnorm", "rmsnorm_gemma"):
            t, h = ints(2)
            return None, 2 * t * h * 2, False
        if fam == "fused_add_rmsnorm":
            t, h = ints(2)
            return None, 4 * t * h * 2, False
        if fam in ("silu_and_mul", "gelu_and_mul", "gelu_tanh_and_mul",
                   "silu_and_mul_clamp", "swiglu_alpha_limit"):
            t, inter = ints(2)
            return None, 3 * t * inter * 2, False
        if fam == "l2norm":
            t, h = ints(2)
            return None, 2 * t * h * 2, False
        if fam in ("mrope_rotary_embedding", "rotary_embedding_interleaved"):
            t, hq, d = ints(3)
            return None, 2 * t * hq * d * 2, False
        if fam == "mla_prefill":
            pass
    except (ValueError, IndexError):
        pass
    return None, None, False


def audit(baseline: dict):
    bad = []
    for name, ms in baseline.items():
        flops, byts, int_ops = implied(name)
        sec = ms / 1e3
        if sec <= 0:
            bad.append((name, ms, "non-positive"))
            continue
        if flops and flops / sec > (INT8 if int_ops else BF16) * TOL:
            bad.append((name, ms, f"{flops / sec / 1e12:.0f} T > {'394' if int_ops else '197'}"))
        elif byts and byts / sec > HBM * TOL:
            bad.append((name, ms, f"{byts / sec / 1e9:.0f} GB/s > 819"))
    return bad


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline.json")
    baseline = json.load(open(path))
    bad = audit(baseline)
    for name, ms, why in bad:
        print(f"IMPOSSIBLE {name} = {ms} ms ({why})")
    if "--purge" in sys.argv and bad:
        for name, _, _ in bad:
            del baseline[name]
        with open(path, "w") as f:
            json.dump(baseline, f, indent=1, sort_keys=True)
        print(f"purged {len(bad)} rows; {len(baseline)} remain")
    elif bad:
        print(f"{len(bad)} impossible rows (run with --purge to delete)")
        sys.exit(1)
    else:
        print(f"physics audit OK ({len(baseline)} entries)")


if __name__ == "__main__":
    main()
