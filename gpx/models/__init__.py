"""Model families: GP regression, GP classification, DLM / DLM-GP."""

from gpx.models import gp

__all__ = ["gp"]
