"""Experimental ops — correct but NOT viable on the target TPU stack.

Modules here are quarantined from the production paths: they execute only
in CPU interpret mode or behind explicit opt-in env vars, with the on-chip
failure mode documented in each module docstring (see PERF.md round 3).
"""
