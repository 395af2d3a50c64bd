"""Ecosystem analysis: cluster learned embeddings into ecological communities
(reference: evaluation/florida_ecosystem_analysis.py and
dashboard/services/ecosystem_processing.py).

Clusters fused observation embeddings (KMeans), characterizes each cluster by
its dominant species and spatial footprint, and scores cluster quality.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np


@dataclass
class EcosystemCluster:
    cluster_id: int
    size: int
    centroid: np.ndarray
    dominant_species: List[int]  # top species indices by frequency
    species_purity: float  # fraction in the single most common species
    center_lat: float
    center_lon: float
    radius_km: float


def analyze_ecosystems(
    embeddings: np.ndarray,
    species: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    n_clusters: int = 8,
    random_state: int = 42,
) -> Dict[str, object]:
    """Cluster embeddings and describe the resulting ecosystems.

    Returns dict with 'clusters' (list of EcosystemCluster), 'labels' (N,),
    and 'silhouette' quality score.
    """
    from sklearn.cluster import KMeans
    from sklearn.metrics import silhouette_score

    x = np.asarray(embeddings, np.float32)
    x = (x - x.mean(0)) / (x.std(0) + 1e-6)
    km = KMeans(n_clusters=n_clusters, random_state=random_state, n_init=4)
    labels = km.fit_predict(x)

    sil = float(silhouette_score(x, labels)) if n_clusters > 1 else 0.0

    from .spatiotemporal import haversine_like

    clusters = []
    for c in range(n_clusters):
        m = labels == c
        if not m.any():
            continue
        sp, counts = np.unique(species[m], return_counts=True)
        order = np.argsort(counts)[::-1]
        clat, clon = float(lat[m].mean()), float(lon[m].mean())
        d = haversine_like(lat[m], lon[m], clat, clon)
        clusters.append(
            EcosystemCluster(
                cluster_id=c,
                size=int(m.sum()),
                centroid=km.cluster_centers_[c],
                dominant_species=[int(s) for s in sp[order][:5]],
                species_purity=float(counts.max() / counts.sum()),
                center_lat=clat,
                center_lon=clon,
                radius_km=float(np.percentile(d, 90)),
            )
        )
    return {"clusters": clusters, "labels": labels, "silhouette": sil}
