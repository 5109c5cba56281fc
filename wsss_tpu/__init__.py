"""wsss_tpu — a TPU-native weakly-supervised semantic segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
lyndonchan/wsss-analysis: multi-label classifier pretraining, Grad-CAM weak
cue generation, dense-CRF refinement (HistoSegNet), SEC, DSRG and IRNet —
one codebase, one device-resident pipeline, sharded over TPU meshes.
"""

__version__ = '0.1.0'
