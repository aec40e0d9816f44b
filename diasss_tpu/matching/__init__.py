"""Robust geo-gated descriptor matching (FEAmatcher equivalents)."""

from .robust import MatchResult, robust_matching

__all__ = ["MatchResult", "robust_matching"]
