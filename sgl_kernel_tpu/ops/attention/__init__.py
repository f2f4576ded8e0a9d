"""Attention kernels: flash prefill, paged decode, state merge (MLA in mla.py)."""

from .flash_prefill import flash_attention  # noqa: F401
from .flash_packed import (  # noqa: F401
    build_packed_metadata,
    flash_attention_packed,
    make_seq_meta,
    pack_padded,
    unpack_to_padded,
)
from .merge_state import apply_sinks, merge_state, merge_state_v2, merge_states  # noqa: F401
from .paged_decode import paged_attention_decode  # noqa: F401
