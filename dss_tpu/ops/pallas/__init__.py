"""Pallas TPU kernels for the hot compute paths.

* log_power  — fused framing + squared-mean + log (reference hot loop #1:
  extensions/hga/hga_optimized.pyx:27-47)
* sampler    — autoregressive vocoder sample loop with on-chip GRU state
  (reference hot loop #3: LPCNet C sample-rate network)
"""
