"""Distributed layer: device meshes, shardings, collectives, ring attention."""

from .ep import ep_fused_experts  # noqa: F401
from .mesh import make_mesh, shard_params  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
from .pp import make_pp_decode_step  # noqa: F401
from .tp import local_config, make_parallel_decode_step, make_parallel_prefill  # noqa: F401
from .ulysses import ulysses_attention  # noqa: F401
