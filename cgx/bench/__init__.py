"""Benchmark harnesses: scaling model + measured runners (see bench.py at
the repo root for the driver-facing headline benchmark)."""
from cgx.bench.scaling import LinkModel, comm_report, measure_scaling

__all__ = ["LinkModel", "comm_report", "measure_scaling"]
