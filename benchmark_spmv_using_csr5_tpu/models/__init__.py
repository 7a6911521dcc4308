from .formats import COOMatrix, CSR5Matrix, CSRMatrix, csr_from_numpy, csr_from_scipy
from .handle import SpMVHandle
