"""Hand-written Pallas TPU kernels (see docs/PERF_NOTES.md for measured
results and the Mosaic constraints that shaped them)."""
from cgx.kernels.bsr import BlockELL, bell_from_bsr, bell_spmm, bell_spmv
from cgx.kernels.stencil import stencil3d_spmv_pallas
from cgx.kernels.fused_cg import fused_stencil_cg
from cgx.kernels.fused_dia_cg import fused_dia_cg
from cgx.kernels.fused_multi import fused_dia_cg_multi, fused_stencil_cg_multi
from cgx.kernels.fused_resident import resident_dia_cg, resident_stencil_cg
from cgx.kernels.fused_semiresident import sr_dia_cg, sr_stencil_cg

__all__ = ["BlockELL", "bell_from_bsr", "bell_spmm", "bell_spmv",
           "stencil3d_spmv_pallas", "fused_stencil_cg", "fused_dia_cg",
           "fused_stencil_cg_multi", "fused_dia_cg_multi",
           "resident_stencil_cg", "resident_dia_cg", "sr_stencil_cg",
           "sr_dia_cg"]
