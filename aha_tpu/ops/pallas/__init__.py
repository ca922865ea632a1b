from aha_tpu.ops.pallas.quant_matmul import quant_matmul

__all__ = ["quant_matmul"]
