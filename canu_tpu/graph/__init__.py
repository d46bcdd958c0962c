from .best_overlap import BestOverlapGraph, build_unitigs  # noqa: F401
