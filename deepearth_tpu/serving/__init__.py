"""Serving layer: REST data service, dashboard client, language embedding
service."""

from .client import DashboardClient
from .language_server import (
    DeepSeekFlaxEmbedder,
    HashEmbedder,
    HFEmbedder,
    LanguageClient,
    LanguageEmbeddingService,
    LanguageServer,
)
from .server import DashboardServer, DataService

__all__ = [
    "DeepSeekFlaxEmbedder",
    "DashboardClient",
    "DashboardServer",
    "DataService",
    "HashEmbedder",
    "HFEmbedder",
    "LanguageClient",
    "LanguageEmbeddingService",
    "LanguageServer",
]
