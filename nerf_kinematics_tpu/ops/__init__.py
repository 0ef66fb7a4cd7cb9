"""Compute kernels: encodings, samplers, compositing, Pallas kernels."""

from .positional_encoding import positional_encoding, encoding_dim
from .sampling import stratified_sample, sample_pdf
from .volume_render import raw2outputs

__all__ = [
    "positional_encoding",
    "encoding_dim",
    "stratified_sample",
    "sample_pdf",
    "raw2outputs",
]
