"""vae_equalizer_tpu — TPU-native blind-equalization framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of ``kit-cel/vae-equalizer``
(Lauinger, Buchali, Schmalen, "Blind equalization and channel estimation in
coherent optical communications using variational autoencoders", IEEE JSAC
2022) for TPU hardware:

* complex baseband stored as stacked real/imag planes (matches the reference
  convention, maps directly onto TPU vector lanes),
* channel simulators, equalizers, losses and metrics are pure jittable
  functions over pytrees,
* the 2x2 MIMO butterfly FIR + soft demapper and the fused ELBO run as
  XLA-compiled convolutions (Pallas kernels for the hot paths in ``ops/``),
* CMA/CMAbatch/CMAflex tap-update recurrences are ``lax.scan`` loops,
* hyperparameter sweeps vmap/shard_map across a TPU device mesh.

Layer map (bottom to top): ``core`` -> ``channels`` -> ``models``/``ops`` ->
``metrics`` -> ``train`` -> ``parallel``/``sweep``.
"""

__version__ = "0.1.0"
