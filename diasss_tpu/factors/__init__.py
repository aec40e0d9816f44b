"""Factor residuals for the SSS SLAM factor graph.

Every factor is a pure function ``residual(variables..., measurement...) -> r`` whose
Jacobians are obtained with ``jax.jacfwd`` on tangent-space perturbations — replacing
the reference's hand-derived GTSAM Jacobians (SSSpointfactor.cpp:19-76), which we
verify against in tests.
"""

from .sss_point import sss_point_residual, sss_point_whitened
from .between import between_residual, prior_residual, point_prior_residual

__all__ = [
    "sss_point_residual",
    "sss_point_whitened",
    "between_residual",
    "prior_residual",
    "point_prior_residual",
]
