"""Solvers: batched dense LM for small factor graphs, sparse pose-graph LM."""

from .lm import LMResult, levenberg_marquardt

__all__ = ["LMResult", "levenberg_marquardt"]
