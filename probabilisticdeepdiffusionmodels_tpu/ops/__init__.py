from .attention import qkv_attention, qkv_attention_xla

# Kernel strategy note: the UNet's hot FLOPs are 3x3 convolutions, which XLA
# lowers to MXU-optimal programs that hand-written Pallas cannot beat.  The
# memory-bound elementwise chains the SURVEY listed as fusion candidates
# (q_sample + loss, the p_step update) are already fused by XLA into their
# neighboring model ops inside the single jitted train-step / sampler-scan —
# measured at ~53-55% MFU end to end — so Pallas versions would add risk
# without bandwidth savings.  Pallas is used where a fused custom schedule
# does pay: the per-(batch,head) attention pipeline (attention_pallas) and
# the GroupNorm+SiLU prologue (groupnorm_pallas), both flag-gated with XLA
# fallbacks and on-TPU parity tests.
