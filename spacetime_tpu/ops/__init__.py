"""Device-side operator algebra: sparse spatial operators, the Kronecker
space-time operator, and the wavelet-in-time transform."""

from .wavelets import WaveletTransform

__all__ = ["WaveletTransform"]
