"""chroma_tpu.ops: the TPU compute path (JAX/XLA/Pallas).

Everything in this package operates on flat device arrays and is jittable.
The host-side classes in chroma_tpu.* marshal into these structures once;
the photon transport loop then runs entirely on device.
"""
