"""Utilities: result scoring, profiling, logging."""

from grasptrajopt_tpu.utils.results import aggregate_results, load_results

__all__ = ["aggregate_results", "load_results"]
