"""Utilities: checkpoint/resume, profiling, debug printers."""
