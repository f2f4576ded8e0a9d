"""Model definitions built on the op library (Llama + Qwen options,
Mixtral, gpt-oss, DeepSeek-MLA, chain speculative decoding)."""

from . import convert, deepseek, gptoss, hybrid_gdn, llama, mixtral, spec  # noqa: F401
