"""Serving layer: REST data service + client."""

from .client import DashboardClient
from .server import DashboardServer, DataService

__all__ = ["DashboardClient", "DashboardServer", "DataService"]
