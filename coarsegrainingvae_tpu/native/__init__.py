"""Native (C++) host-runtime components, loaded via ctypes.

Built on first use with g++ (cached as a .so next to the sources); every
consumer has a pure-numpy fallback, so the package works without a
toolchain.
"""
from coarsegrainingvae_tpu.native import cell_list as cell_list
