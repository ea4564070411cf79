"""cmoop_audio_processing_tpu: TPU-native constrained multi-objective NAS
for TinyML audio classification.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sumansamui/CMOOP_Audio_Processing: NSGA-II / SA-NSGA-II (Kriging surrogates,
LCB local search, LHS & PSI initialization) / penalty-scalarized MOBO over a
288-point residual-CNN genome space, with whole candidate populations trained
as single vmapped/pjit device programs.
"""

__version__ = "0.1.0"
