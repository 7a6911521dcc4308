from .convert import build_csr5, csr5_to_csr, convert_timings
from .csr5_spmv import csr5_spmv, csr5_spmv_xla
from .reference import coo_spmv, csr_spmm, csr_spmv, csr_spmv_scan
