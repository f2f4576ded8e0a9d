"""Device mesh construction and weight shardings.

The distributed layer the reference only stubs (SURVEY §2.4: custom
allreduce declared-only, TP implicit in kernel arguments). TPU-native
design: a named mesh ("dp", "tp") over ICI, NamedSharding on the weight
pytree, shard_map for the kernel-containing model step, and jax.lax
collectives (psum / all_gather / ppermute) instead of NCCL/MSCCL kernels.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int], devices=None) -> Mesh:
    """Build a Mesh from {"dp": 2, "tp": 4}-style axis sizes."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axes.values())))
    assert len(devices) >= n, (len(devices), axes)
    arr = np.asarray(devices[:n]).reshape(*axes.values())
    return Mesh(arr, tuple(axes.keys()))


def llama_param_specs(mesh: Mesh, tp_axis: str = "tp"):
    """PartitionSpecs for the llama weight pytree under tensor parallelism.

    Column-parallel (output rows sharded): qkv, gate_up. Row-parallel
    (input cols sharded, psum after): o, down. Embeds/norms replicated.
    Quantized entries shard packed codes and scales on the same N axis.
    """
    t = tp_axis

    def linear_spec(row_parallel: bool, stacked: bool):
        # dense [L?, N, K] — shard N for column-parallel, K for row-parallel
        lead = (None,) if stacked else ()
        if row_parallel:
            return P(*lead, None, t)
        return P(*lead, t, None)

    def qspec(row_parallel: bool, stacked: bool):
        # K-paired packed [L?, K/2, N], scales [L?, K/G, N]:
        # column-parallel shards N (last dim), row-parallel shards K
        lead = (None,) if stacked else ()
        if row_parallel:
            return {"packed": P(*lead, t, None), "scales": P(*lead, t, None)}
        return {"packed": P(*lead, None, t), "scales": P(*lead, None, t)}

    def spec_for(name, value, stacked):
        row = name in ("o", "down")
        if isinstance(value, dict):
            return qspec(row, stacked)
        return linear_spec(row, stacked)

    def build(params):
        specs = {
            "embed": P(None, None),
            "final_norm": P(None),
            "lm_head": (
                {"packed": P(None, None), "scales": P(None, None)}
                if isinstance(params["lm_head"], dict)
                else P(None, None)
            ),
            "layers": {},
        }
        for name, value in params["layers"].items():
            if name in ("q", "k", "v", "o", "gate", "up", "down"):
                specs["layers"][name] = spec_for(name, value, stacked=True)
            else:
                specs["layers"][name] = P(None, None)
        return specs

    return build


def shard_params(params, mesh: Mesh, specs):
    """device_put the weight pytree with NamedShardings from a spec pytree."""
    # specs first so is_leaf can stop recursion at PartitionSpec (a tuple type)
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs,
        params,
        is_leaf=lambda s: isinstance(s, P),
    )
