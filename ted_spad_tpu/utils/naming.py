"""Deterministic output names for per-video artifacts (features, visualizations).

Same-basename videos in different directories (fine for UCF-Crime naming, which is
unique) would silently clobber each other's outputs; ``dedup_names`` disambiguates
duplicates with a short uri hash. Compute it over the FULL input list before any
sharding — cross-shard duplicates must also disambiguate (each shard sees only its
slice of the list)."""

from __future__ import annotations

import hashlib
import os


def base_name(uri: str) -> str:
    """Filesystem-safe stem of a video uri (also handles synthetic:// uris)."""
    return (
        os.path.basename(uri)
        .rsplit(".", 1)[0]
        .replace("synthetic://", "synth_")
        .replace(",", "_")
        .replace("=", "")
    )


def dedup_names(uris: list[str]) -> dict[str, str]:
    """uri -> unique deterministic stem; duplicates get a ``_<sha1[:8]>`` suffix."""
    seen: dict[str, int] = {}
    for u in uris:
        b = base_name(u)
        seen[b] = seen.get(b, 0) + 1
    names: dict[str, str] = {}
    for u in uris:
        b = base_name(u)
        if seen[b] > 1:
            b = b + "_" + hashlib.sha1(u.encode()).hexdigest()[:8]
        names[u] = b
    return names
