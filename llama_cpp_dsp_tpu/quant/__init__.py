from .ref_numpy import dequantize, quantize

__all__ = ["dequantize", "quantize"]
