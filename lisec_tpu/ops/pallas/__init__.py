"""Pallas TPU kernels for ops where XLA's lowering leaves performance
on the table (SURVEY.md §7: "kernels are profiled into existence").

Each kernel has an interpret-mode path (used by the CPU test suite) and
an XLA-ops fallback, selected by the public wrappers in
``lisec_tpu.ops``.
"""

from lisec_tpu.ops.pallas.fps_kernel import fps_pallas

__all__ = ["fps_pallas"]
