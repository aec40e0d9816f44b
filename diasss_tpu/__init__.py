"""diasss_tpu — TPU-native side-scan sonar SLAM engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the reference
C++ framework ``halajun/diasss`` (feature-based SSS SLAM).  See SURVEY.md for the
component inventory and /root/reference for the behavioral reference.
"""

__version__ = "0.1.0"
