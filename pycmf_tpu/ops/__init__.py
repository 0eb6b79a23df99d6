"""Core ops: links, losses, precision-controlled matmul, sparse."""
from .matmul import gram, matmul, set_default_precision
from .sparse import CsrMatrix, csr_from_dense, csr_from_scipy, spmm

__all__ = ["gram", "matmul", "set_default_precision", "CsrMatrix",
           "csr_from_dense", "csr_from_scipy", "spmm"]
