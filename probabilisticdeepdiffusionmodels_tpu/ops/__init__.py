from .attention import qkv_attention, qkv_attention_xla
