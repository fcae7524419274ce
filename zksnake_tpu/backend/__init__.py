"""TPU-native compute core: limb-tensor field arithmetic, NTT, MSM, SpMV.

This package is the rebuild's equivalent of the reference's Rust `_algebra`
native core (/root/reference/src/): batched int32-limb kernels under jit,
sharded over a device mesh for multi-chip scale-out.
"""
