"""Model definitions built on the op library (Llama, DeepSeek-MLA, MoE...)."""
