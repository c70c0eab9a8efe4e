"""Device kernels: all the dense math of the framework.

Everything in this package is pure JAX (jit-able, shardable); Pallas kernels
carry an XLA fallback for CPU-mesh testing and non-TPU backends.
"""

from .lpc import lpc_synthesize, lpc_synthesize_scan

__all__ = ["lpc_synthesize", "lpc_synthesize_scan"]
