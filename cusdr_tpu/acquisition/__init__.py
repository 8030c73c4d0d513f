"""Acquisition engines (PCPS coarse + fine frequency search)."""

from .pcps import AcquisitionResult, acquire  # noqa: F401
