"""Import-path parity shim for the reference's missing module.

The reference's consistency/stability metrics import
``segmentation.analysis.equivariance.quantile_map``
(`metrics/consistency.py:17-18`) from a file absent from its repo
(SURVEY.md §2.9); the behavior was reconstructed from the call sites in
``analysis/common.py``.  This module re-exports it under the
reference's import path so ports of downstream scripts work unchanged.
"""

from scaleprotoseg_tpu.analysis.common import quantile_map  # noqa: F401
