"""Batched TPU compute kernels (JAX/XLA/Pallas).

Field elements live on device as eight 16-bit limbs in uint32 lanes,
limb-major: an array of shape ``(8, *batch)`` (see
:mod:`stark_tpu.ops.limbs`).  All arithmetic is Montgomery-form
(:mod:`stark_tpu.ops.field_ops`), with conversions at the API edges.
"""
