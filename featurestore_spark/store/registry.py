"""Feature registry: the dictionary of registered features that drives
wide-table pivots (diamond/store/FeatureStore.scala:10-18,
FeatureStoreRepository.scala:25-62, models/Feature.scala:17-45).

Driver-side small data: plain dataclasses + CSV persistence. The
registered attribute list feeds `snapshot_pivot(features=...)` so the
pivot never needs a distinct-values scan.
"""

from __future__ import annotations

import csv
import os
from dataclasses import asdict, dataclass, fields


@dataclass
class Feature:
    attribute: str
    attribute_type: str = "Base"  # Base | Transformed | Derived
    namespace: str = "default"
    encoding: str = ""
    description: str = ""
    active: bool = True


class FeatureStore:
    def __init__(self):
        self._features: dict[tuple[str, str], Feature] = {}

    def register_feature(self, feature: Feature) -> None:
        self._features[(feature.namespace, feature.attribute)] = feature

    def features(self, namespace: str | None = None, active_only: bool = True) -> list[Feature]:
        out = [
            f
            for f in self._features.values()
            if (namespace is None or f.namespace == namespace)
            and (not active_only or f.active)
        ]
        return sorted(out, key=lambda f: (f.namespace, f.attribute))

    def attribute_names(self, namespace: str | None = None) -> list[str]:
        """Pivot column list for snapshot_pivot/chord_pivot."""
        return [f.attribute for f in self.features(namespace)]

    # -- CSV persistence (FeatureStoreRepository.scala:25-62) ---------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cols = [f.name for f in fields(Feature)]
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for feat in self.features(active_only=False):
                w.writerow(asdict(feat))

    @classmethod
    def load(cls, path: str) -> "FeatureStore":
        store = cls()
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                row["active"] = str(row.get("active", "True")).lower() in ("true", "1")
                store.register_feature(Feature(**row))
        return store
