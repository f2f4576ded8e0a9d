"""Multi-host execution: jax.distributed init, hybrid DCN x ICI meshes,
and scaling measurement.

The reference scales over multiple GPUs/hosts with NCCL process groups
managed by the serving framework (SURVEY §2.4; the custom-allreduce stub
sgl_kernel_ops.h and torch.distributed wiring live outside the kernel
library). TPU-native design: one global JAX runtime spanning hosts
(`jax.distributed.initialize`), a single Mesh whose LEADING axes cross
hosts over DCN and whose trailing axes stay inside each host's ICI
domain, and shardings chosen so per-step collectives (tp psum) ride ICI
only — data parallelism across hosts needs no per-token collective at
all, which is what makes the >=80% multi-host serving-scaling target
achievable (BASELINE.md).

Key invariant: `make_hybrid_mesh({"dp": H}, {"tp": L})` places each
process's local devices contiguously in the trailing (ICI) axes, so any
collective over an ICI axis has replica groups entirely within one
process. `assert_no_dcn_collectives` verifies this on the COMPILED HLO
of a step function — the multi-host analog of "no NCCL call on the
critical path".
"""

from __future__ import annotations

import collections
import re
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize the cross-host runtime. Returns True when running
    multi-process. No-op (False) for the common single-host case so the
    same code path serves both."""
    if coordinator_address is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def make_hybrid_mesh(
    dcn_axes: Dict[str, int],
    ici_axes: Dict[str, int],
    devices=None,
    processes: Optional[int] = None,
) -> Mesh:
    """Mesh with leading axes spanning hosts (DCN) and trailing axes
    within each host (ICI).

    dcn_axes/ici_axes: ordered {name: size}. prod(dcn) must equal the
    process count (or `processes` when simulating hosts on one process —
    the 8-virtual-CPU-device test setup), and prod(ici) the per-host
    device count.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n_dcn = int(np.prod(list(dcn_axes.values()))) if dcn_axes else 1
    n_ici = int(np.prod(list(ici_axes.values()))) if ici_axes else 1
    assert n_dcn * n_ici == len(devices), (dcn_axes, ici_axes, len(devices))

    by_proc = collections.defaultdict(list)
    for d in devices:
        by_proc[d.process_index].append(d)
    if len(by_proc) > 1:
        # real multi-process: each host's devices form one ICI block
        assert len(by_proc) == n_dcn, (len(by_proc), n_dcn)
        ordered = []
        for p in sorted(by_proc):
            block = sorted(by_proc[p], key=lambda d: d.id)
            assert len(block) == n_ici, (len(block), n_ici)
            ordered.extend(block)
    else:
        # single process (e.g. CPU-simulated hosts): consecutive blocks
        # of n_ici devices act as pseudo-hosts; `processes` (when given)
        # must match the simulated host count
        assert processes in (None, n_dcn), (
            f"processes={processes} but dcn axes give {n_dcn} simulated hosts")
        ordered = sorted(devices, key=lambda d: d.id)
    arr = np.asarray(ordered).reshape(
        *(list(dcn_axes.values()) + list(ici_axes.values()))
    )
    return Mesh(arr, tuple(list(dcn_axes) + list(ici_axes)))


def _collective_replica_groups(hlo_text: str):
    """Yield (op_name, groups) for each collective in compiled HLO text.
    Handles the brace form ``replica_groups={{0,1},{2,3}}`` AND the iota
    form ``replica_groups=[2,4]<=[8]`` XLA emits on larger meshes (an
    IotaReplicaGroupList: reshape iota(prod) to the listed dims, last dim
    = group members; an optional (dims)T(perm) transpose applies)."""
    pat = re.compile(
        r"(all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute)"
        r"[^\n]*?replica_groups=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}"
    )
    for m in pat.finditer(hlo_text):
        groups = [
            [int(x) for x in g.split(",") if x.strip()]
            for g in re.findall(r"\{([^}]*)\}", m.group(2))
        ]
        yield m.group(1), groups
    pat_iota = re.compile(
        r"(all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute)"
        r"[^\n]*?replica_groups=\[(\d+),(\d+)\]<=(?:\[([\d,]+)\]T\(([\d,]+)\)|\[(\d+)\])"
    )
    for m in pat_iota.finditer(hlo_text):
        op, n_groups, per_group = m.group(1), int(m.group(2)), int(m.group(3))
        total = n_groups * per_group
        if m.group(6) is not None:  # plain <=[N]
            ids = np.arange(total)
        else:  # <=[dims]T(perm)
            dims = [int(x) for x in m.group(4).split(",")]
            perm = [int(x) for x in m.group(5).split(",")]
            ids = np.arange(int(np.prod(dims))).reshape(dims).transpose(perm).reshape(-1)[:total]
        yield op, ids.reshape(n_groups, per_group).tolist()
    # collective-permute uses source_target_pairs instead
    pat2 = re.compile(r"collective-permute[^\n]*?source_target_pairs=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}")
    for m in pat2.finditer(hlo_text):
        pairs = [
            tuple(int(x) for x in g.split(","))
            for g in re.findall(r"\{([^}]*)\}", m.group(1))
        ]
        yield "collective-permute", [list(p) for p in pairs]


def assert_no_dcn_collectives(compiled, mesh: Mesh, n_ici: int):
    """Check the compiled step has no collective whose replica group
    crosses an ICI block boundary (i.e. would ride DCN). Device ids are
    mesh-linearized; devices i and j share a host iff i//n_ici == j//n_ici."""
    hlo = compiled.as_text()
    n_dev = mesh.devices.size
    # participant indices in replica_groups are MESH-LINEARIZED positions,
    # not physical device ids: host block = index // n_ici (physical-id
    # arithmetic breaks for non-contiguous device subsets)
    offenders = []
    n_seen = 0
    for op, groups in _collective_replica_groups(hlo):
        n_seen += 1
        for g in groups:
            hosts = {i // n_ici for i in g}
            if len(hosts) > 1:
                offenders.append((op, g))
    assert not offenders, f"collectives crossing DCN: {offenders[:5]}"
    # vacuity guard: a multi-device step with NO parsed collective means
    # the HLO used a replica-group syntax we failed to parse — the check
    # would silently pass while verifying nothing
    if n_dev > 1 and n_seen == 0 and re.search(r"all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute", hlo):
        raise AssertionError(
            "collectives present but none parsed — unknown replica_groups "
            "syntax; update _collective_replica_groups")
    return True


def collective_inventory(compiled, mesh: Mesh, n_ici: int):
    """Structured collective report for a compiled step — the honest
    multi-host scaling artifact (BASELINE.md): every collective with its
    group count/size and whether it stays inside one ICI block. The >=80%
    scaling claim rests on every entry being ici_only=True (zero DCN
    traffic per step), not on simulator timings."""
    from collections import defaultdict

    hlo = compiled.as_text()
    agg = defaultdict(lambda: {"count": 0, "group_sizes": set(), "ici_only": True})
    for op, groups in _collective_replica_groups(hlo):
        rec = agg[op]
        rec["count"] += 1
        rec["group_sizes"].update(len(g) for g in groups)
        if any(len({i // n_ici for i in g}) > 1 for g in groups):
            rec["ici_only"] = False
    return [
        {"op": op, "count": rec["count"],
         "group_sizes": sorted(rec["group_sizes"]), "ici_only": rec["ici_only"]}
        for op, rec in sorted(agg.items())
    ]


def process_local_slice(global_batch: int, axis_size: int, axis_index: int):
    """Rows of a [global_batch, ...] input owned by one dp shard."""
    assert global_batch % axis_size == 0, (
        f"global_batch {global_batch} not divisible by dp={axis_size}: the "
        f"last {global_batch % axis_size} rows would be owned by no shard")
    per = global_batch // axis_size
    return slice(axis_index * per, (axis_index + 1) * per)
